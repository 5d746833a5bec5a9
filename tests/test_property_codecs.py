"""Property-based codec tests (hypothesis): random images/waveforms must
survive encode→decode bit-exactly, and the decoders must reject corrupted
magic bytes instead of mis-decoding — pure-Python, no Spark session.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from kinbaku_spark.operators.codecs import CODECS

SETTINGS = settings(max_examples=25, deadline=None)

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@given(hw=dims, seed=st.integers(0, 2**31 - 1))
@SETTINGS
def test_png_rgb_roundtrip_any_size(hw, seed):
    h, w = hw
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)
    dw, dh, px = CODECS["decode_png"](CODECS["encode_png"](img))
    assert (dw, dh) == (w, h)
    assert (px == img).all()


@given(hw=dims, seed=st.integers(0, 2**31 - 1))
@SETTINGS
def test_png_gray_roundtrip_any_size(hw, seed):
    h, w = hw
    img = np.random.RandomState(seed).randint(0, 256, (h, w), np.uint8)
    _, _, px = CODECS["decode_png"](CODECS["encode_png"](img))
    assert (px[:, :, 0] == img).all()


@given(hw=dims, seed=st.integers(0, 2**31 - 1))
@SETTINGS
def test_bmp_roundtrip_any_size_and_padding(hw, seed):
    # width sweeps every row-padding residue class (w*3 mod 4)
    h, w = hw
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)
    dw, dh, px = CODECS["decode_bmp"](CODECS["encode_bmp"](img))
    assert (dw, dh) == (w, h)
    assert (px == img).all()


@given(
    n=st.integers(1, 500),
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
@SETTINGS
def test_wav_roundtrip_any_length(n, sr, seed):
    samples = (
        np.random.RandomState(seed).randint(-32768, 32768, n).astype(np.int16)
    )
    dsr, dn, out = CODECS["decode_wav"](CODECS["encode_wav"](samples, sr))
    assert (dsr, dn) == (sr, n)
    assert (out == samples).all()


@given(hw=dims, seed=st.integers(0, 2**31 - 1))
@SETTINGS
def test_header_dims_agree_with_full_decode(hw, seed):
    h, w = hw
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)
    for enc in ("encode_png", "encode_bmp"):
        payload = CODECS[enc](img)
        assert CODECS["image_dims"](payload) == (w, h)
        px = CODECS["image_pixels"](payload)
        assert (px.shape[1], px.shape[0]) == (w, h)


@given(junk=st.binary(min_size=0, max_size=64))
@SETTINGS
def test_unknown_magic_rejected(junk):
    magics = (b"\x89PNG\r\n\x1a\n", b"BM", b"\xff\xd8", b"GIF8")
    if any(junk.startswith(m[: len(junk)] if len(junk) < len(m) else m) for m in magics):
        return  # could legitimately sniff as a real (truncated) format
    with pytest.raises(ValueError):
        CODECS["image_dims"](junk)


# --------------------------------------------------------------- JPEG/MJPEG

from kinbaku_spark.operators.jpeg import make_jpeg_codec

_JPEG = make_jpeg_codec()


@given(hw=dims, seed=st.integers(0, 2**31 - 1))
@SETTINGS
def test_jpeg_decodes_any_size_without_error_and_deterministically(hw, seed):
    """JPEG is lossy, so the property is structural: any HxWx3 input
    encodes to a stream our general decoder accepts, with the original
    dimensions, uint8 range, and byte-identical re-encode (determinism —
    the MJPEG AVI byte-level contract depends on it)."""
    h, w = hw
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)
    payload = _JPEG["encode_jpeg"](img)
    assert payload == _JPEG["encode_jpeg"](img.copy())
    out = _JPEG["decode_jpeg"](payload)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8


@given(hw=dims, v=st.integers(0, 255))
@SETTINGS
def test_jpeg_constant_closed_form_property(hw, v):
    """Constant inputs of ANY shape decode to the oracle's closed form
    (padding to 8-multiples must not leak into the cropped output)."""
    h, w = hw
    out = _JPEG["decode_jpeg"](_JPEG["encode_jpeg"](np.full((h, w, 3), v, np.uint8)))
    want = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
    assert (out == want).all()


@given(hw=dims, seed=st.integers(0, 2**31 - 1), nf=st.integers(1, 4))
@SETTINGS
def test_mjpeg_avi_roundtrip_structure(hw, seed, nf):
    h, w = hw
    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (h, w, 3), np.uint8) for _ in range(nf)]
    usec, dw, dh, out = CODECS["decode_avi"](CODECS["encode_avi_mjpeg"](frames, 40000))
    assert (usec, dw, dh, len(out)) == (40000, w, h, nf)
    for f in out:
        assert f.shape == (h, w, 3)


@given(
    fmt=st.sampled_from(["png", "bmp", "wav", "avi", "mjpg", "gif"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=120, deadline=None)
def test_all_decoders_raise_valueerror_only_on_byte_flips(fmt, seed):
    """Executor-safety contract across every codec: a byte-flipped payload
    either decodes or raises ValueError — no zlib.error, wave.Error,
    EOFError, IndexError, or struct.error escapes the decode boundary."""
    import random

    rng = random.Random(seed)
    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    if fmt == "png":
        good, dec = CODECS["encode_png"](img), CODECS["decode_png"]
    elif fmt == "bmp":
        good, dec = CODECS["encode_bmp"](img), CODECS["decode_bmp"]
    elif fmt == "wav":
        good, dec = (
            CODECS["encode_wav"](np.arange(50, dtype=np.int16), 16000),
            CODECS["decode_wav"],
        )
    elif fmt == "avi":
        good, dec = CODECS["encode_avi"]([img]), CODECS["decode_avi"]
    elif fmt == "gif":
        good, dec = CODECS["encode_gif"](img[:, :, 0]), CODECS["decode_gif"]
    else:
        good, dec = CODECS["encode_avi_mjpeg"]([img]), CODECS["decode_avi"]
    b = bytearray(good)
    for _ in range(rng.randint(1, 3)):
        b[rng.randrange(len(b))] = rng.randrange(256)
    try:
        dec(bytes(b))
    except ValueError:
        pass


@given(hw=dims, seed=st.integers(0, 2**31 - 1))
@SETTINGS
def test_gif_roundtrip_any_size(hw, seed):
    h, w = hw
    img = np.random.RandomState(seed).randint(0, 256, (h, w), np.uint8)
    dw, dh, px = CODECS["decode_gif"](CODECS["encode_gif"](img))
    assert (dw, dh) == (w, h)
    assert (px[:, :, 0] == img).all()
