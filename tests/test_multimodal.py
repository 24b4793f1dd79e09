"""Multimodal plumbing tests (X6): binary schema, Arrow feature extraction,
frame-sampling fan-out, and the honest-stub contract for real codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from webscale_vector_search_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    frame_sample_plan,
    media_from_documents,
)
from webscale_vector_search_spark.sources.fixtures import load_table


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, "documents", SF_SMOKE).filter(F.col("doc_id") < 60)
    return media_from_documents(docs).cache()


def test_media_schema_and_types(media):
    pdf = media.toPandas()
    assert set(pdf.columns) == {"media_id", "media_type", "content", "n_bytes", "content_hash"}
    assert set(pdf["media_type"]) == {"image", "audio", "video"}
    assert (pdf["n_bytes"] > 0).all()
    assert isinstance(pdf["content"].iloc[0], (bytes, bytearray))


def test_extract_features_deterministic_shape(media):
    f1 = extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    f2 = extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert len(f1) == media.count()
    assert all(len(v) == FEATURE_DIM for v in f1["feature"])
    assert all((a == b).all() for a, b in zip(f1["feature"], f2["feature"]))
    # features are normalized byte means
    import numpy as np

    assert all(0.0 <= float(np.max(v)) <= 1.0 for v in f1["feature"])


def test_frame_sample_plan_fanout(media):
    frames = frame_sample_plan(media, every_n=2).toPandas()
    assert len(frames) > 0
    assert (frames["frame_no"] % 2 == 0).all()
    videos = media.filter(F.col("media_type") == "video").count()
    assert frames["media_id"].nunique() == videos


def test_decode_image_bmp_png_roundtrip():
    """The pure-python codec (r6, replacing the stub): decode(encode(x))
    round-trips exactly for BMP-24, PNG-gray, PNG-RGB, PNG-RGBA."""
    import numpy as np

    from webscale_vector_search_spark.operators.multimodal import (
        decode_image_bytes,
        encode_bmp,
        encode_png,
    )

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)  # odd width: BMP row pad
    assert np.array_equal(decode_image_bytes(encode_bmp(rgb)), rgb)
    assert np.array_equal(decode_image_bytes(encode_png(rgb)), rgb)
    gray = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    assert np.array_equal(decode_image_bytes(encode_png(gray)), gray[:, :, None])
    rgba = rng.integers(0, 256, (6, 4, 4), dtype=np.uint8)
    assert np.array_equal(decode_image_bytes(encode_png(rgba)), rgba)


def test_decode_png_all_filter_types():
    """The unfilter paths 1-4 (Sub/Up/Average/Paeth) never run on filter-0
    encodes — exercise each by filtering scanlines by hand per the spec and
    checking the decoder reconstructs the original pixels."""
    import struct
    import zlib

    import numpy as np

    from webscale_vector_search_spark.operators.multimodal import decode_image_bytes

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    h, w, c = px.shape

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    for ftype in (1, 2, 3, 4):
        raw = bytearray()
        flat = px.reshape(h, w * c).astype(np.int16)
        for r in range(h):
            raw.append(ftype)
            up = flat[r - 1] if r else np.zeros(w * c, dtype=np.int16)
            for i in range(w * c):
                x = int(flat[r][i])
                left = int(flat[r][i - c]) if i >= c else 0
                ul = int(flat[r - 1][i - c]) if (r and i >= c) else 0
                if ftype == 1:
                    raw.append((x - left) & 0xFF)
                elif ftype == 2:
                    raw.append((x - int(up[i])) & 0xFF)
                elif ftype == 3:
                    raw.append((x - ((left + int(up[i])) >> 1)) & 0xFF)
                else:
                    raw.append((x - paeth(left, int(up[i]), ul)) & 0xFF)

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_image_bytes(png), px), f"filter {ftype}"


def test_decode_image_dataframe_and_poison_isolation(spark):
    """decode_image over a media DataFrame: real payloads decode to shape +
    channel means; an undecodable payload yields decode_error, not a failed
    job (poison-file isolation — load-bearing at corpus scale)."""
    import numpy as np

    from webscale_vector_search_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
    )

    rng = np.random.default_rng(3)
    img_a = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(encode_bmp(img_a))),
        (2, "image", bytearray(encode_png(img_b))),
        (3, "image", bytearray(b"not an image at all")),
        (4, "audio", bytearray(b"\x00\x01")),  # filtered out: not an image
    ]
    media = spark.createDataFrame(
        rows, "media_id BIGINT, media_type STRING, content BINARY"
    )
    out = decode_image(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert out["media_id"].tolist() == [1, 2, 3]
    a, b, bad = out.iloc[0], out.iloc[1], out.iloc[2]
    assert (a["height"], a["width"], a["channels"]) == (8, 6, 3)
    assert (b["height"], b["width"], b["channels"]) == (4, 4, 3)
    assert np.allclose(a["channel_means"], img_a.reshape(-1, 3).mean(axis=0), atol=1e-4)
    assert np.allclose(b["channel_means"], img_b.reshape(-1, 3).mean(axis=0), atol=1e-4)
    import pandas as pd

    assert bad["decode_error"] is not None and pd.isna(bad["height"])


def _mutants(seed: int = 11):
    """Deterministic adversarial payloads from valid BMP/PNG seeds (VERDICT
    r7 #6): truncations, CRC/length corruption, zero/negative-dim headers,
    stride-overflow dims, zlib garbage, byte flips, and raw noise."""
    import struct

    import numpy as np

    from webscale_vector_search_spark.operators.multimodal import encode_bmp, encode_png

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    bmp, png = encode_bmp(rgb), encode_png(rgb)
    out: list[tuple[str, bytes]] = []
    for name, b in (("bmp", bmp), ("png", png)):
        # truncations at every region: header, mid-data, last byte
        for cut in (1, 10, len(b) // 3, len(b) // 2, len(b) - 1):
            out.append((f"{name}_trunc_{cut}", b[:cut]))
        # single-byte flips across the payload (headers, lengths, CRCs, data)
        for pos in rng.integers(0, len(b), 24):
            mut = bytearray(b)
            mut[pos] ^= 0xFF
            out.append((f"{name}_flip_{pos}", bytes(mut)))
    # zero/negative dimensions in the BMP header (w at 18, h at 22)
    for w, h in ((0, 9), (7, 0), (0, 0), (-7, 9)):
        mut = bytearray(bmp)
        struct.pack_into("<ii", mut, 18, w, h)
        out.append((f"bmp_dims_{w}x{h}", bytes(mut)))
    # stride overflow: header claims far more pixels than the payload holds
    mut = bytearray(bmp)
    struct.pack_into("<ii", mut, 18, 1 << 20, 1 << 20)
    out.append(("bmp_dims_overflow", bytes(mut)))
    # PNG IHDR dim tampering (w/h at offset 16/20) — CRC now wrong too,
    # which the lenient decoder ignores; dims drive the reshape
    for w, h in ((0, 9), (7, 0), (1 << 20, 1 << 20)):
        mut = bytearray(png)
        struct.pack_into(">II", mut, 16, w & 0xFFFFFFFF, h & 0xFFFFFFFF)
        out.append((f"png_dims_{w}x{h}", bytes(mut)))
    # IDAT payload replaced with non-zlib garbage (length/CRC intact)
    idat_at = png.index(b"IDAT")
    (idat_len,) = struct.unpack_from(">I", png, idat_at - 4)
    mut = bytearray(png)
    mut[idat_at + 4 : idat_at + 4 + idat_len] = bytes(rng.integers(0, 256, idat_len))
    out.append(("png_idat_garbage", bytes(mut)))
    # pure noise payloads + empty + magic-only prefixes
    out.append(("noise", bytes(rng.integers(0, 256, 64))))
    out.append(("empty", b""))
    out.append(("bmp_magic_only", b"BM"))
    out.append(("png_magic_only", b"\x89PNG\r\n\x1a\n"))
    return out


def test_codec_fuzz_never_escapes(spark):
    """No exception class escapes decode_image: every adversarial payload
    either decodes to a sane shape with finite stats or lands in
    decode_error — the poison-isolation contract at 100 TB."""
    import numpy as np
    import pandas as pd

    mutants = _mutants()
    media = spark.createDataFrame(
        [(i, "image", payload, len(payload), name) for i, (name, payload) in enumerate(mutants)],
        "media_id BIGINT, media_type STRING, content BINARY, n_bytes BIGINT, content_hash STRING",
    )
    got = decode_image(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert len(got) == len(mutants)  # the job survived every payload
    names = [n for n, _ in mutants]
    for i, row in got.iterrows():
        if row["decode_error"] is None:
            # a mutation the lenient decoder tolerates (e.g. a CRC flip)
            # must still produce a sane, finite decode
            assert row["height"] > 0 and row["width"] > 0, names[i]
            assert row["channels"] in (1, 3, 4), names[i]
            assert np.isfinite(np.asarray(row["channel_means"], dtype=float)).all(), names[i]
        else:
            assert pd.isna(row["height"]), names[i]
    # the targeted classes MUST fail (a zero-dim header that "succeeds"
    # would flow NaN stats downstream silently)
    by_name = dict(zip(names, got["decode_error"]))
    for name in (
        "bmp_dims_0x9", "bmp_dims_7x0", "bmp_dims_0x0", "bmp_dims_-7x9",
        "bmp_dims_overflow", "png_dims_0x9", "png_dims_7x0",
        "png_dims_1048576x1048576", "png_idat_garbage", "noise", "empty",
        "bmp_magic_only", "png_magic_only",
    ):
        assert by_name[name] is not None, f"{name} must land in decode_error"
