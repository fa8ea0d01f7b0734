"""S2 CSV ingest and P7 upload-extension predicate (sources/catalog.py;
reference server.py:298, 308)."""

from __future__ import annotations

from pyspark.sql import functions as F

from leadsight_sales_agent_spark.sources.catalog import (
    load,
    read_csv,
    supported_upload_predicate,
)
from leadsight_sales_agent_spark.sources.excel import validate_companies_contract


class TestCsvIngest:
    def test_read_csv_with_header_and_contract(self, spark, tmp_path):
        p = tmp_path / "companies.csv"
        p.write_text(
            "company_name,website\n"
            "Acme Inc,https://acme.example.com\n"
            '"Quote, Co",https://quote.example.com\n'
        )
        df = read_csv(spark, str(p))
        validate_companies_contract(df)
        rows = df.orderBy("company_name").collect()
        assert [r["company_name"] for r in rows] == ["Acme Inc", "Quote, Co"]
        assert all(r["website"].startswith("https://") for r in rows)

    def test_read_csv_with_explicit_schema(self, spark, tmp_path):
        p = tmp_path / "typed.csv"
        p.write_text("k,v\n1,2.5\n2,3.5\n")
        df = read_csv(spark, str(p), schema="k INT, v DOUBLE")
        assert dict(df.dtypes) == {"k": "int", "v": "double"}
        assert df.count() == 2


class TestUploadExtensionPredicate:
    def test_p7_extension_gate(self, spark):
        files = spark.createDataFrame(
            [
                ("companies.xlsx", True),
                ("legacy.xls", True),
                ("export.csv", True),
                ("notes.txt", False),
                ("archive.csv.gz", False),
                ("xlsx", False),  # extension only counts after a dot
                ("data.CSV", False),  # reference endswith is case-sensitive
            ],
            "name STRING, expect BOOLEAN",
        )
        got = files.withColumn("ok", supported_upload_predicate("name")).collect()
        for r in got:
            assert r["ok"] == r["expect"], r["name"]

    def test_gate_composes_with_listing_filter(self, spark):
        names = [(f"f{i}.{ext}",) for i, ext in enumerate(["xlsx", "txt", "csv", "pdf"])]
        files = spark.createDataFrame(names, "name STRING")
        kept = files.filter(supported_upload_predicate(F.col("name"))).collect()
        assert sorted(r["name"] for r in kept) == ["f0.xlsx", "f2.csv"]


class TestJsonl:
    def test_round_trip_preserves_rows_and_schema(self, spark, sf_dir, tmp_path):
        from leadsight_sales_agent_spark.sources.catalog import (
            load,
            read_jsonl,
            write_jsonl,
        )

        docs = load(spark, sf_dir, "documents")
        out = str(tmp_path / "docs_jsonl")
        write_jsonl(docs, out, partitions=3)
        back = read_jsonl(spark, out, schema=docs.schema)
        assert back.count() == docs.count()
        assert back.schema == docs.schema
        a = {r["doc_id"]: r["text"] for r in docs.collect()}
        b = {r["doc_id"]: r["text"] for r in back.collect()}
        assert a == b

    def test_corrupt_lines_do_not_fail_the_scan(self, spark, tmp_path):
        from leadsight_sales_agent_spark.sources.catalog import read_jsonl

        p = tmp_path / "mixed.jsonl"
        p.write_text('{"a": 1}\nnot json at all\n{"a": 3}\n')
        df = read_jsonl(spark, str(p))  # PERMISSIVE inference
        rows = df.collect()
        assert len(rows) == 3  # corrupt line kept as a record, not a crash
        ok = [r["a"] for r in rows if r["a"] is not None]
        assert sorted(ok) == [1, 3]


class TestOrc:
    def test_orc_round_trip(self, spark, sf_dir, tmp_path):
        # ORC is the other columnar format Spark ships natively; the
        # catalog is parquet-first but nothing in the engine assumes it
        from leadsight_sales_agent_spark.sources.catalog import load

        docs = load(spark, sf_dir, "documents")
        out = str(tmp_path / "docs_orc")
        docs.write.mode("overwrite").orc(out)
        back = spark.read.orc(out)
        assert back.schema == docs.schema
        assert sorted(r["doc_id"] for r in back.collect()) == sorted(
            r["doc_id"] for r in docs.collect()
        )

    def test_orc_predicate_pushdown(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from leadsight_sales_agent_spark.sources.catalog import load

        out = str(tmp_path / "orders_orc")
        load(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
        df = spark.read.orc(out).filter(F.col("o_orderkey") < 100).select("o_orderkey")
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:120]


class TestOrcCatalogHelpers:
    def test_orc_round_trip_preserves_rows_and_schema(self, spark, sf_dir, tmp_path):
        from leadsight_sales_agent_spark.sources.catalog import (
            load,
            read_orc,
            write_orc,
        )

        docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
        out = str(tmp_path / "docs_orc")
        write_orc(docs, out, partitions=2)
        back = read_orc(spark, out)
        assert back.schema == docs.schema
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))

    def test_orc_scan_pushes_filters(self, spark, sf_dir, tmp_path):
        # the 100 TB contract holds for ORC exactly as for parquet:
        # predicates reach the scan node
        from leadsight_sales_agent_spark.plans import formatted_plan
        from leadsight_sales_agent_spark.sources.catalog import (
            load,
            read_orc,
            write_orc,
        )
        from pyspark.sql import functions as F

        out = str(tmp_path / "orders_orc")
        write_orc(load(spark, sf_dir, "orders"), out, partitions=2)
        q = read_orc(spark, out).filter(F.col("o_totalprice") > 1000.0).select(
            "o_orderkey"
        )
        plan = formatted_plan(q)
        assert "PushedFilters: [" in plan
        assert "o_totalprice" in plan.split("PushedFilters:")[1].split("]")[0]


class TestXml:
    def test_xml_round_trip(self, spark, sf_dir, tmp_path):
        from leadsight_sales_agent_spark.sources.catalog import (
            load,
            read_xml,
            write_xml,
        )

        nat = load(spark, sf_dir, "nation")
        out = str(tmp_path / "nation_xml")
        write_xml(nat, out, row_tag="nation", partitions=1)
        back = read_xml(spark, out, row_tag="nation")
        assert sorted(back.columns) == sorted(nat.columns)
        assert sorted(map(tuple, back.select(*nat.columns).collect())) == sorted(
            map(tuple, nat.collect())
        )

    def test_xml_nested_elements_become_structs(self, spark, tmp_path):
        from leadsight_sales_agent_spark.sources.catalog import read_xml

        p = tmp_path / "nested.xml"
        p.write_text(
            "<rows><row><id>1</id><meta><lang>en</lang><n>3</n></meta></row>"
            "<row><id>2</id><meta><lang>de</lang><n>4</n></meta></row></rows>"
        )
        df = read_xml(spark, str(p), row_tag="row")
        rows = {r["id"]: r["meta"] for r in df.collect()}
        assert rows[1]["lang"] == "en" and rows[2]["n"] == 4


class TestPythonDataSource:
    def test_partition_planning_and_determinism(self, spark):
        from leadsight_sales_agent_spark.sources.pydatasource import (
            SyntheticDocsDataSource,
            _doc_for,
        )

        spark.dataSource.register(SyntheticDocsDataSource)
        df = (
            spark.read.format("synthetic_docs")
            .option("n_rows", 100)
            .option("n_partitions", 7)
            .load()
        )
        assert df.rdd.getNumPartitions() == 7  # ceil(100/ceil(100/7)) ranges
        rows = {r["doc_id"]: (r["text"], r["lang"]) for r in df.collect()}
        assert len(rows) == 100
        # executor-side content equals the pure driver-side function
        did, text, lang = _doc_for(42)
        assert rows[42] == (text, lang)
        # re-read is bit-stable (retry idempotency)
        again = {r["doc_id"]: (r["text"], r["lang"]) for r in df.collect()}
        assert rows == again

    def test_composes_with_engine_operators(self, spark):
        from pyspark.sql import functions as F

        from leadsight_sales_agent_spark.sources.pydatasource import (
            SyntheticDocsDataSource,
        )

        spark.dataSource.register(SyntheticDocsDataSource)
        df = (
            spark.read.format("synthetic_docs")
            .option("n_rows", 500)
            .option("n_partitions", 4)
            .load()
        )
        per_lang = df.groupBy("lang").agg(F.count("*").alias("n")).collect()
        assert sum(r["n"] for r in per_lang) == 500
        assert {r["lang"] for r in per_lang} <= {"en", "de", "fr", "es", "zh"}


class TestBinaryFileSource:
    def test_binaryfile_reads_bytes_with_metadata(self, spark, tmp_path):
        # the built-in binaryFile source is the ingestion seam for the
        # multimodal family: opaque bytes + path/length metadata
        payloads = {f"blob_{i}.bin": bytes([i]) * (10 + i) for i in range(3)}
        for name, data in payloads.items():
            (tmp_path / name).write_bytes(data)
        df = spark.read.format("binaryFile").load(str(tmp_path))
        rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
        assert set(rows) == set(payloads)
        for name, data in payloads.items():
            assert bytes(rows[name]["content"]) == data
            assert rows[name]["length"] == len(data)

    def test_binaryfile_path_glob_filter(self, spark, tmp_path):
        (tmp_path / "keep.png").write_bytes(b"x" * 4)
        (tmp_path / "skip.txt").write_bytes(b"y" * 4)
        df = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.png")
            .load(str(tmp_path))
        )
        assert [r["path"].rsplit("/", 1)[-1] for r in df.collect()] == ["keep.png"]


class TestPythonStreamingDataSource:
    def test_offset_stream_replays_the_deterministic_corpus(
        self, spark, tmp_path
    ):
        # the message-queue contract: offsets in, rows + next offset
        # out; the capped source drains under availableNow and the
        # collected union equals the batch generator exactly
        from leadsight_sales_agent_spark.sources.pydatasource import (
            SyntheticDocsDataSource,
            _doc_for,
        )

        spark.dataSource.register(SyntheticDocsDataSource)
        got: list = []

        def sink(df, _epoch):
            got.extend(
                (r["doc_id"], r["text"], r["lang"]) for r in df.collect()
            )

        # NOTE: availableNow snapshots only the FIRST prefetched
        # micro-batch of a SimpleDataSourceStreamReader, so the drain
        # loop runs a continuous trigger and stops once the capped
        # source is exhausted.
        import time

        q = (
            spark.readStream.format("synthetic_docs")
            .option("n_rows", 120)
            .option("batch_rows", 50)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt_pyds"))
            .trigger(processingTime="1 seconds")
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline and len(got) < 120:
            time.sleep(1)
        q.stop()
        assert sorted(got) == [_doc_for(i) for i in range(120)]


class TestPartitionedWrites:
    def test_dynamic_partition_overwrite_touches_only_written_partitions(
        self, spark, sf_dir, tmp_path
    ):
        """partitionOverwriteMode=dynamic is the idempotent-backfill
        primitive: re-running a day's job overwrites THAT day's
        partition and leaves the rest of the table intact (static mode
        would truncate everything). The replay-safety contract every
        incremental pipeline rests on."""
        out = str(tmp_path / "orders_parts")
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        o.write.partitionBy("o_orderpriority").mode("overwrite").parquet(out)
        before = {
            r["o_orderpriority"]: r["n"]
            for r in spark.read.parquet(out)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            # backfill ONE priority with half its rows
            repl = o.filter(
                (o.o_orderpriority == "1-URGENT") & (o.o_orderkey % 2 == 0)
            )
            n_repl = repl.count()
            repl.write.partitionBy("o_orderpriority").mode("overwrite").parquet(out)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        after = {
            r["o_orderpriority"]: r["n"]
            for r in spark.read.parquet(out)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert after["1-URGENT"] == n_repl, "target partition not replaced"
        for k, v in before.items():
            if k != "1-URGENT":
                assert after[k] == v, f"untouched partition {k} changed"

    def test_zstd_codec_round_trip(self, spark, sf_dir, tmp_path):
        """Columnar compression is a first-order cost lever at 100 TB;
        pin that the engine writes and reads zstd parquet (the modern
        default: snappy-class speed, gzip-class ratio)."""
        import glob
        import os

        out = str(tmp_path / "li_zstd")
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
        li.write.option("compression", "zstd").mode("overwrite").parquet(out)
        files = glob.glob(os.path.join(out, "*.zstd.parquet"))
        assert files, "zstd codec suffix missing from written files"
        back = spark.read.parquet(out)
        assert back.count() == li.count()
