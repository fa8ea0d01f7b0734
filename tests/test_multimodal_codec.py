"""Edge pins for the stdlib BMP codec (operators/multimodal.py r9):
row padding at every width mod 4, bottom-up flip, BGR order, and the
decode_image_stub routing contract."""

from __future__ import annotations

import pytest

from leadsight_sales_agent_spark.operators.multimodal import (
    decode_bmp,
    decode_image_stub,
    encode_bmp,
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
