"""Real-codec resize family (VERDICT r7 item #3): PNG/GIF/JPEG payloads
are now really decoded -> NN-resampled -> re-encoded by resize_images,
with the same content-preservation pins as the resize_ppm tests —
pixel-exact for the lossless formats, a bounded-error pin for JPEG
(all-ones quant: DCT coefficient rounding only), passthrough flags only
for non-raster payloads (mp4)."""

from __future__ import annotations

import numpy as np
import pytest

from factory_inspectors_db_etl_spark.operators.gif import (
    encode_gif,
    parse_gif_indexed,
    resize_gif,
)
from factory_inspectors_db_etl_spark.operators.jpeg import (
    encode_jpeg,
    parse_jpeg,
    resize_jpeg,
)
from factory_inspectors_db_etl_spark.operators.multimodal import (
    _parse_png,
    encode_png,
    image_dims,
    resize_images,
    resize_png,
)


def _nn(arr: np.ndarray, nw: int, nh: int) -> np.ndarray:
    h, w = arr.shape[:2]
    return arr[np.ix_((np.arange(nh) * h) // nh, (np.arange(nw) * w) // nw)]


def test_resize_png_nearest_neighbor_pixel_exact():
    rng = np.random.RandomState(1)
    px = rng.randint(0, 256, (4, 8, 3)).astype(np.uint8)
    src = encode_png(px)
    out = resize_png(src, 4)
    nw, nh, arr = _parse_png(out)
    assert (nw, nh) == (4, 2)
    # lossless: every output pixel bit-identical to its NN source pixel
    assert (arr == _nn(px, 4, 2)).all()
    # within-bounds passthrough + idempotence, byte-identical
    assert resize_png(src, 8) == src
    assert resize_png(out, 4) == out
    # tall aspect
    tall = encode_png(rng.randint(0, 256, (8, 2, 3)).astype(np.uint8))
    tw, th, _ = _parse_png(resize_png(tall, 4))
    assert (tw, th) == (1, 4)
    with pytest.raises(ValueError):
        resize_png(b"nonsense", 4)
    with pytest.raises(ValueError):
        resize_png(src, 0)


def test_resize_gif_index_space_pixel_exact():
    # distinct indices so every sampled position is checkable; a
    # non-trivial (non-identity) palette proves color preservation
    idx = (np.arange(32, dtype=np.uint8).reshape(4, 8) * 7) % 256
    rng = np.random.RandomState(2)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    src = encode_gif(idx, palette=pal)
    out = resize_gif(src, 4)
    nw, nh, oidx, oct_ = parse_gif_indexed(out)
    assert (nw, nh) == (4, 2)
    assert (oidx == _nn(idx, 4, 2)).all()
    # palette carried through unchanged (256 entries both sides here)
    assert (oct_[:256] == pal).all()
    # interlaced source resizes identically (parse de-interlaces first)
    inter = encode_gif(idx, palette=pal, interlace=True)
    _, _, iidx, _ = parse_gif_indexed(resize_gif(inter, 4))
    assert (iidx == _nn(idx, 4, 2)).all()
    # passthrough + idempotence
    assert resize_gif(src, 8) == src
    assert resize_gif(out, 4) == out
    with pytest.raises(ValueError):
        resize_gif(b"nonsense", 4)


def test_resize_gif_small_palette_zero_padded():
    # a 2-entry source color table re-encodes under the canonical
    # 256-entry GCT; referenced entries are preserved verbatim
    idx = (np.indices((4, 8)).sum(axis=0) % 2).astype(np.uint8)
    small = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    out = bytearray(encode_gif(idx, palette=np.vstack([small, np.zeros((254, 3), np.uint8)])))
    _, _, oidx, oct_ = parse_gif_indexed(resize_gif(bytes(out), 4))
    assert (oct_[:2] == small).all()
    assert (oidx == _nn(idx, 4, 2)).all()


def test_resize_jpeg_bounded_error_and_grid_snap():
    rng = np.random.RandomState(3)
    y, cb, cr = (rng.randint(0, 256, (32, 48)).astype(np.uint8) for _ in range(3))
    src = encode_jpeg(y, cb, cr)
    out = resize_jpeg(src, 16)
    w2, h2, nc2, planes2 = parse_jpeg(out)
    # 48x32 @ 16 -> (16, 10) snapped down to the MCU grid -> (16, 8)
    assert (w2, h2, nc2) == (16, 8, 3)
    # bounded-error pin: re-encode error is DCT coefficient rounding
    # only (all-ones quant), <= 2 grey levels per pixel per plane
    _, _, _, planes = parse_jpeg(src)
    for p_src, p_out in zip(planes, planes2):
        exp = _nn(p_src, 16, 8)
        assert int(np.abs(exp.astype(int) - p_out.astype(int)).max()) <= 2
    # constant blocks still round-trip bit-exactly through the resize
    const = encode_jpeg(np.full((16, 16), 77, np.uint8))
    _, _, _, cpl = parse_jpeg(resize_jpeg(const, 8))
    assert (cpl[0] == 77).all() and cpl[0].shape == (8, 8)
    # passthrough + idempotence, byte-identical
    assert resize_jpeg(src, 48) == src
    assert resize_jpeg(out, 16) == out
    with pytest.raises(ValueError):
        resize_jpeg(src, 7)  # below the MCU grid
    with pytest.raises(ValueError):
        resize_jpeg(b"nonsense", 16)


def test_image_dims_header_only():
    rng = np.random.RandomState(4)
    png = encode_png(rng.randint(0, 256, (4, 8, 3)).astype(np.uint8))
    gif = encode_gif((np.arange(32, dtype=np.uint8)).reshape(4, 8))
    jpg = encode_jpeg(rng.randint(0, 256, (16, 24)).astype(np.uint8))
    ppm = b"P6\n8 4\n255\n" + bytes(96)
    assert image_dims(png) == (8, 4)
    assert image_dims(gif) == (8, 4)
    assert image_dims(jpg) == (24, 16)
    assert image_dims(ppm) == (8, 4)
    with pytest.raises(ValueError):
        image_dims(b"\x00\x00mp4-ish")
    # header truth survives truncation past the header (no raster read)
    assert image_dims(png[:33]) == (8, 4)


def test_resize_images_dispatches_all_formats(spark):
    rng = np.random.RandomState(5)
    png = encode_png(rng.randint(0, 256, (4, 16, 3)).astype(np.uint8))
    gif = encode_gif((np.arange(64, dtype=np.uint8)).reshape(4, 16))
    jpg = encode_jpeg(rng.randint(0, 256, (16, 32)).astype(np.uint8))
    mp4ish = b"\x00\x00\x00\x18ftypisom not a raster"
    rows = [
        (1, bytearray(png), ("image/png", 16, 4, 1)),
        (2, bytearray(gif), ("image/gif", 16, 4, 1)),
        (3, bytearray(jpg), ("image/jpeg", 32, 16, 1)),
        (4, bytearray(mp4ish), ("video/mp4", 0, 0, 3)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "meta struct<mime:string,width:int,height:int,n_frames:int>",
    )
    out = {r["doc_id"]: r for r in resize_images(df, max_side=8).collect()}
    # every raster format really resized, meta rewritten with truth
    assert out[1]["resized"] and image_dims(bytes(out[1]["payload"])) == (8, 2)
    assert (out[1]["meta"]["width"], out[1]["meta"]["height"]) == (8, 2)
    assert out[2]["resized"] and image_dims(bytes(out[2]["payload"])) == (8, 2)
    assert out[3]["resized"] and image_dims(bytes(out[3]["payload"])) == (8, 8)
    # mp4 is the only passthrough (VERDICT r7 item #3 done-condition)
    assert out[4]["resized"] is False
    assert bytes(out[4]["payload"]) == mp4ish
    assert out[4]["meta"]["n_frames"] == 3


# ---------------------------------------------------------------------------
# Round-8 review fixes: header parity, descriptor dims, snap-enlarge guard
# ---------------------------------------------------------------------------


def test_image_dims_accepts_comment_bearing_ppm_header():
    """image_dims must accept exactly the headers _parse_ppm accepts —
    the old fixed-window regex rejected '#' comments the decode path
    handles (round-8 review)."""
    from factory_inspectors_db_etl_spark.operators.multimodal import image_dims

    payload = b"P6\n# a comment line\n4 2\n255\n" + bytes(4 * 2 * 3)
    assert image_dims(payload) == (4, 2)


def test_image_dims_gif_reports_first_image_not_logical_screen():
    """A valid external GIF may declare a logical screen larger than its
    first image; meta must describe what decode_gif rasterizes (round-8
    review)."""
    import numpy as np

    from factory_inspectors_db_etl_spark.operators.gif import encode_gif, parse_gif_indexed
    from factory_inspectors_db_etl_spark.operators.multimodal import image_dims

    idx = (np.arange(100, dtype=np.uint8).reshape(10, 10)) % 4
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[:4] = [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]]
    p = bytearray(encode_gif(idx, palette=palette))
    # patch the logical-screen descriptor to 200x100 (image stays 10x10)
    p[6:8] = (200).to_bytes(2, "little")
    p[8:10] = (100).to_bytes(2, "little")
    w, h, got_idx, _ = parse_gif_indexed(bytes(p))
    assert (w, h) == (10, 10)  # the decoder rasterizes the descriptor dims
    assert image_dims(bytes(p)) == (10, 10)  # meta now agrees with the raster
    assert np.array_equal(got_idx, idx)


def test_resize_jpeg_refuses_to_enlarge_thin_images():
    """The 8x8-MCU snap floors to 8; when the aspect-correct short side
    is below 8 that would UPSCALE — resize must refuse (ValueError ->
    caller passthrough), never enlarge (round-8 review)."""
    import numpy as np
    import pytest

    from factory_inspectors_db_etl_spark.operators.jpeg import (
        encode_jpeg,
        parse_jpeg,
        resize_jpeg,
    )

    y = (np.arange(104 * 8, dtype=np.int64).reshape(8, 104) % 256).astype("u1")
    p = bytearray(encode_jpeg(y))
    i = p.find(b"\xff\xc0")  # patch SOF dims: emulate an external 100x4 JPEG
    p[i + 5 : i + 7] = (4).to_bytes(2, "big")
    p[i + 7 : i + 9] = (100).to_bytes(2, "big")
    w, h, _, planes = parse_jpeg(bytes(p))
    assert (w, h) == (100, 4) and planes[0].shape == (4, 100)
    with pytest.raises(ValueError, match="enlarge"):
        resize_jpeg(bytes(p), 16)
    # and the wide-but-legal equality case still resizes: 104x8 @ 16
    out = resize_jpeg(bytes(bytearray(encode_jpeg(y))), 16)
    ow, oh, _, _ = parse_jpeg(out)
    assert (ow, oh) == (16, 8)  # height snaps to exactly the source height
