"""Baseline JPEG codec (stages/jpeg.py)."""

import numpy as np
import pytest

from aida_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([np.clip(2 * yy + seed, 0, 255),
                     np.clip(3 * xx + seed, 0, 255),
                     np.clip(yy + xx + seed, 0, 255)],
                    axis=2).astype(np.uint8)


def test_roundtrip_error_bounded_by_quantization():
    for h, w in [(8, 8), (24, 32), (17, 23)]:     # incl. non-multiples
        img = _gradient(h, w, 20)
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == (h, w, 3)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 8, (h, w, int(err.max()))


def test_flat_image_near_exact():
    img = np.full((16, 16, 3), 137, np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert np.abs(dec.astype(int) - 137).max() <= 2


def test_third_party_baseline_jpeg():
    """Decode a JPEG written by a real encoder (not our own inverse);
    verify structural content, not just absence of crashes: the
    flower-of-life figure is strongly mirror-symmetric."""
    import os
    path = ("/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
            "requests/ext/flower-of-life.jpg")
    if not os.path.exists(path):
        pytest.skip("no third-party JPEG on this host")
    with open(path, "rb") as f:
        img = decode_jpeg(f.read())
    assert img.shape == (161, 161, 3) and img.dtype.name == "uint8"
    g = img.mean(axis=2)
    lr = np.corrcoef(g.flatten(), g[:, ::-1].flatten())[0, 1]
    assert lr > 0.7                       # noise would be ~0
    assert (g > 200).mean() > 0.5         # mostly-white figure


def test_progressive_third_party():
    """SOF2 progressive JPEGs (spectral selection + successive
    approximation) decode with natural-image structure: strong
    adjacent-pixel correlation that a corrupted coefficient stream
    would destroy."""
    import os
    path = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if not os.path.exists(path):
        pytest.skip("no progressive JPEG on this host")
    with open(path, "rb") as f:
        img = decode_jpeg(f.read())
    assert img.shape == (312, 493, 3)
    g = img.mean(axis=2)
    h = np.corrcoef(g[:, :-1].flatten(), g[:, 1:].flatten())[0, 1]
    assert h > 0.9
    assert g.mean() > 200                 # mostly-white banner


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG....")


def test_mjpeg_avi_roundtrip_and_sampling():
    from aida_ray.stages.jpeg import (encode_mjpeg_avi,
                                      extract_mjpeg_frames)
    from aida_ray.stages.multimodal import StdlibDecodeBackend
    frames = [encode_jpeg(_gradient(16, 16, 10 * i)) for i in range(5)]
    avi = encode_mjpeg_avi(frames, 16, 16)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    got = extract_mjpeg_frames(avi)
    assert got == frames
    be = StdlibDecodeBackend()
    sampled = be.sample_frames(avi, 3)
    assert len(sampled) == 3
    assert all(f.shape == (16, 16, 3) for f in sampled)
    # uniform sampling picks first and last frames; brightness rises
    assert sampled[0].mean() < sampled[-1].mean()
    # n larger than frame count degrades gracefully
    assert len(be.sample_frames(avi, 99)) == 5


def test_avi_rejects_non_riff():
    from aida_ray.stages.jpeg import extract_mjpeg_frames
    with pytest.raises(ValueError, match="RIFF"):
        extract_mjpeg_frames(b"nope")


# --------------------------------------------------------------- GIF

def test_gif_roundtrip():
    from aida_ray.stages.jpeg import decode_gif, encode_gif
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (17, 3)).astype(np.uint8)
    idx = rng.integers(0, 17, (13, 29))
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def test_gif_third_party_goldens():
    """Real-encoder GIFs (true LZW with growing code widths, not our
    uncompressed trick) decode with sane structure."""
    import os

    from aida_ray.stages.jpeg import decode_gif
    cases = [("/usr/share/doc/libxslt1-dev/html/node.gif", (497, 460)),
             ("/usr/share/doc/libxslt1-dev/html/smallfootonly.gif",
              (60, 48))]
    ran = False
    for path, (h, w) in cases:
        if not os.path.exists(path):
            continue
        ran = True
        img = decode_gif(open(path, "rb").read())
        assert img.shape == (h, w, 3)
        # diagram/logo images are mostly light background
        assert img.mean() > 150
    if not ran:
        pytest.skip("no third-party GIFs on this host")


def test_gif_rejects_non_gif():
    from aida_ray.stages.jpeg import decode_gif
    with pytest.raises(ValueError, match="GIF87a"):
        decode_gif(b"\x89PNG")


# ------------------------------------------------------- audio codecs

def test_g711_tables_spec_anchors():
    from aida_ray.stages.multimodal import _ALAW_TABLE, _MULAW_TABLE
    # mu-law: 0xFF is zero, 0x80/0x00 are the +/- extremes (32124)
    assert _MULAW_TABLE[0xFF] == 0
    assert _MULAW_TABLE[0x80] == 32124
    assert _MULAW_TABLE[0x00] == -32124
    # A-law: inverted sign convention — 0x55 is -8, 0xD5 is +8
    assert _ALAW_TABLE[0x55] == -8 and _ALAW_TABLE[0xD5] == 8
    # both tables byte-exact vs CPython's audioop reference decoder
    import audioop

    import numpy as np
    assert np.array_equal(
        np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), "<i2"),
        _MULAW_TABLE)
    assert np.array_equal(
        np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), "<i2"),
        _ALAW_TABLE)


def test_wav_format_matrix_roundtrip():
    import numpy as np

    from aida_ray.stages.multimodal import (StdlibDecodeBackend,
                                            encode_ima_adpcm_wav,
                                            encode_mulaw_wav,
                                            encode_pcm8_wav, encode_wav)
    be = StdlibDecodeBackend()
    w = (np.sin(np.linspace(0, 25, 2000)) * 11000).astype(np.int16)
    sr, d = be.decode_audio(encode_wav(w, 16000))
    assert sr == 16000 and np.array_equal(d, w)      # PCM16 exact
    _, d8 = be.decode_audio(encode_pcm8_wav(w))
    assert np.abs(d8.astype(int) - w.astype(int)).max() <= 256
    _, dm = be.decode_audio(encode_mulaw_wav(w))
    rel = np.abs(dm.astype(int) - w.astype(int)) \
        / np.maximum(np.abs(w.astype(int)), 64)
    assert rel.max() < 0.08                          # segment quantizer
    _, da = be.decode_audio(encode_ima_adpcm_wav(w))
    n = min(len(da), len(w))
    assert np.abs(da[:n].astype(int)
                  - w[:n].astype(int)).mean() < 100


def test_wav_rejects_unknown():
    import pytest as _pytest

    from aida_ray.stages.multimodal import StdlibDecodeBackend
    be = StdlibDecodeBackend()
    with _pytest.raises(ValueError, match="RIFF"):
        be.decode_audio(b"nope")
