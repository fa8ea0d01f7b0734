"""Edge pins for the stdlib image codecs (operators/multimodal.py):
BMP (r9) — row padding at every width mod 4, bottom-up flip, BGR
order; PPM/P6 (r10) — variable-length ASCII header with comments,
maxval gate, top-down RGB — and the decode_image_stub routing
contract for both."""

from __future__ import annotations

import pytest

from leadsight_sales_agent_spark.operators.multimodal import (
    decode_bmp,
    decode_image_stub,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)


class TestBmpCodec:
    def test_roundtrip_all_padding_widths(self):
        # widths 1..8 cover every row-padding remainder twice
        for w in range(1, 9):
            for h in (1, 2, 5):
                pix = lambda x, y: ((x * 3 + y) % 256, (x + 7 * y) % 256, (x * y) % 256)
                payload = encode_bmp(w, h, pix)
                dw, dh, rows = decode_bmp(payload)
                assert (dw, dh) == (w, h)
                assert rows == [[pix(x, y) for x in range(w)] for y in range(h)]
                # declared size in the file header matches reality
                import struct

                assert struct.unpack_from("<I", payload, 2)[0] == len(payload)

    def test_top_row_is_row_zero(self):
        # distinct corner pixel proves the bottom-up flip is undone
        payload = encode_bmp(2, 2, lambda x, y: (y * 100 + x, 0, 0))
        _, _, rows = decode_bmp(payload)
        assert rows[0][0] == (0, 0, 0)
        assert rows[1][1] == (101, 0, 0)

    def test_stub_routes_bmp_and_refuses_the_rest(self):
        payload = encode_bmp(3, 3, lambda x, y: (1, 2, 3))
        assert decode_image_stub(payload)[0] == 3
        with pytest.raises(NotImplementedError):
            decode_image_stub(b"\x89PNG\r\n\x1a\n....")

    def test_decode_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_bmp(b"BMshort")
        good = encode_bmp(4, 4, lambda x, y: (0, 0, 0))
        with pytest.raises(ValueError):
            decode_bmp(good[:-5])  # truncated pixel data


class TestPpmCodec:
    def test_roundtrip_including_multidigit_headers(self):
        # widths/heights spanning 1- and 2-digit header tokens prove
        # the variable-length ASCII header writer/parser agree
        for w in (1, 3, 9, 10, 23):
            for h in (1, 2, 12):
                pix = lambda x, y: ((x * 5 + y) % 256, (x + 11 * y) % 256, (3 * x * y + 1) % 256)
                payload = encode_ppm(w, h, pix)
                dw, dh, rows = decode_ppm(payload)
                assert (dw, dh) == (w, h)
                assert rows == [[pix(x, y) for x in range(w)] for y in range(h)]
                hdr = f"P6\n{w} {h}\n255\n".encode()
                assert payload.startswith(hdr)
                assert len(payload) == len(hdr) + 3 * w * h

    def test_rows_are_top_down_rgb(self):
        # distinct corner proves no flip and no BGR swap
        payload = encode_ppm(2, 2, lambda x, y: (y * 100 + x, 7, 9))
        _, _, rows = decode_ppm(payload)
        assert rows[0][0] == (0, 7, 9)
        assert rows[1][1] == (101, 7, 9)

    def test_header_comments_and_flexible_whitespace(self):
        raw = b"P6\n# made by a netpbm tool\n4  2\n# why not here too\n255\n" + bytes(
            range(24)
        )
        dw, dh, rows = decode_ppm(raw)
        assert (dw, dh) == (4, 2)
        assert rows[0][0] == (0, 1, 2) and rows[1][3] == (21, 22, 23)

    def test_stub_routes_ppm(self):
        payload = encode_ppm(3, 2, lambda x, y: (1, 2, 3))
        assert decode_image_stub(payload)[:2] == (3, 2)

    def test_decode_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_ppm(b"P5\n1 1\n255\n\x00")  # PGM magic is not P6
        with pytest.raises(ValueError):
            decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")  # 16-bit
        good = encode_ppm(4, 4, lambda x, y: (0, 0, 0))
        with pytest.raises(ValueError):
            decode_ppm(good[:-2])  # truncated pixel data
        with pytest.raises(ValueError):
            decode_ppm(b"P6\n4")  # truncated header


class TestRle8Codec:
    """BI_RLE8 pins (r12): the decompression state machine — run
    splits, absolute mode + word padding, EOL/EOB, palette lookup,
    bottom-up flip — plus every refusal path."""

    PAL = [(i, (3 * i) % 256, (7 * i) % 256) for i in range(256)]

    def _enc(self, w, h, idx, abs_row=lambda y: y % 3 == 0):
        from leadsight_sales_agent_spark.operators.multimodal import (
            encode_bmp_rle8,
        )

        return encode_bmp_rle8(w, h, idx, self.PAL, abs_row)

    def test_roundtrip_runs_and_absolute_rows(self):
        from leadsight_sales_agent_spark.operators.multimodal import (
            decode_bmp_rle8,
        )

        for w in range(4, 12):
            for h in (3, 4, 7):
                n1 = (w + 1) // 2
                idx = lambda x, y: (9 + 11 * y + (0 if x < n1 else 5)) % 256
                payload = self._enc(w, h, idx)
                dw, dh, rows = decode_bmp_rle8(payload)
                assert (dw, dh) == (w, h)
                assert rows == [
                    [self.PAL[idx(x, y)] for x in range(w)] for y in range(h)
                ]
                # declared file size and biSizeImage match reality
                import struct

                assert struct.unpack_from("<I", payload, 2)[0] == len(payload)
                data_off = struct.unpack_from("<I", payload, 10)[0]
                assert struct.unpack_from("<I", payload, 34)[0] == len(
                    payload
                ) - data_off

    def test_absolute_mode_pads_odd_counts_to_word(self):
        # w=9 -> first run n1=5 (odd) through absolute mode on y%3==0
        # rows: escape(2) + 5 literals + 1 pad; same image with
        # abs_row=False is all encoded runs — the byte delta per
        # absolute row is exactly 2 + n1 + 1 - 2 = n1 + 1
        idx = lambda x, y: 1 if x < 5 else 2
        with_abs = self._enc(9, 3, idx)
        without = self._enc(9, 3, idx, abs_row=lambda y: False)
        assert len(with_abs) - len(without) == 6  # one abs row (y=0): 5+1

    def test_top_row_is_row_zero(self):
        from leadsight_sales_agent_spark.operators.multimodal import (
            decode_bmp_rle8,
        )

        idx = lambda x, y: y * 10 + (0 if x < 2 else 1)
        _, _, rows = decode_bmp_rle8(self._enc(4, 2, idx))
        assert rows[0][0] == self.PAL[0] and rows[1][2] == self.PAL[11]

    def test_stub_dispatches_on_compression_field(self):
        from leadsight_sales_agent_spark.operators.multimodal import (
            decode_image_stub,
            encode_bmp,
        )

        rle = self._enc(5, 3, lambda x, y: 7)
        assert decode_image_stub(rle)[:2] == (5, 3)  # comp=1 -> RLE8
        flat = encode_bmp(5, 3, lambda x, y: (1, 2, 3))
        assert decode_image_stub(flat)[:2] == (5, 3)  # comp=0 -> 24-bit

    def test_decode_refusals(self):
        import pytest

        from leadsight_sales_agent_spark.operators.multimodal import (
            RLE8_DATA_OFF,
            decode_bmp_rle8,
            encode_bmp,
        )

        with pytest.raises(ValueError):
            decode_bmp_rle8(encode_bmp(4, 4, lambda x, y: (0, 0, 0)))  # comp=0
        good = bytearray(self._enc(6, 4, lambda x, y: 1))
        over = good.copy()
        over[RLE8_DATA_OFF] = 200  # encoded run overflows the 6-wide row
        with pytest.raises(ValueError):
            decode_bmp_rle8(bytes(over))
        with pytest.raises(ValueError):
            decode_bmp_rle8(bytes(good[:-4]))  # no end-of-bitmap
        delta = good.copy()
        delta[RLE8_DATA_OFF : RLE8_DATA_OFF + 2] = b"\x00\x02"  # delta escape
        with pytest.raises(ValueError):
            decode_bmp_rle8(bytes(delta))

    def test_decode_refusals_palette_and_header_bounds(self):
        """r13 (advisor): a pixel index past the header-declared palette
        must be a ValueError refusal (not a late IndexError), and
        hostile header dimensions must refuse before the grid
        allocation."""
        import struct

        import pytest

        from leadsight_sales_agent_spark.operators.multimodal import (
            RLE8_DATA_OFF,
            decode_bmp_rle8,
        )

        good = bytearray(self._enc(6, 4, lambda x, y: 1))
        # shrink the declared palette below the encoded index 1
        small_pal = good.copy()
        struct.pack_into("<I", small_pal, 46, 1)  # clr_used = 1
        with pytest.raises(ValueError, match="outside palette"):
            decode_bmp_rle8(bytes(small_pal))
        # absolute-mode row (y=0 is abs via default abs_row) hits the
        # same guard on the literal-byte path
        abs_bad = bytearray(self._enc(6, 4, lambda x, y: 2, lambda y: True))
        struct.pack_into("<I", abs_bad, 46, 2)  # clr_used = 2, index 2 used
        with pytest.raises(ValueError, match="outside palette"):
            decode_bmp_rle8(bytes(abs_bad))
        # hostile dimensions: refuse before allocating width*height
        huge = good.copy()
        struct.pack_into("<i", huge, 18, 1 << 20)  # width
        struct.pack_into("<i", huge, 22, 1 << 20)  # height
        with pytest.raises(ValueError, match="implausible"):
            decode_bmp_rle8(bytes(huge))
        neg = good.copy()
        struct.pack_into("<i", neg, 18, -6)  # negative width
        with pytest.raises(ValueError, match="invalid BMP width"):
            decode_bmp_rle8(bytes(neg))
        # declared palette larger than the 8-bit index space
        pal_big = good.copy()
        struct.pack_into("<I", pal_big, 46, 1024)
        with pytest.raises(ValueError, match="invalid BMP palette size"):
            decode_bmp_rle8(bytes(pal_big))
