"""DeepSpeech feature-extraction tests (preprocess/deepspeech.py):
feature math properties, TF-convention LSTM vs a numpy reference,
aud.npy contract shapes, and the converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np

from hfa_gp_tpu.preprocess import deepspeech as ds


def test_mfcc_shapes_and_rate():
    sr = 16000
    audio = np.random.default_rng(0).normal(0, 0.1, sr * 2)  # 2 s
    feat = ds.mfcc(audio)
    # 25 ms window / 10 ms hop → ~100 frames/sec
    assert feat.shape[1] == 26
    assert abs(feat.shape[0] - 199) <= 2
    vec = ds.input_vectors(audio)
    assert vec.shape == (feat[::2].shape[0], 494)
    # whole-utterance normalization
    np.testing.assert_allclose(vec.mean(), 0.0, atol=1e-4)
    np.testing.assert_allclose(vec.std(), 1.0, atol=1e-3)


def test_mfcc_tone_hits_matching_mel_bin():
    """A pure tone's energy concentrates in the mel filter containing
    its frequency (sanity of fft→mel plumbing)."""
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t)
    frames = tone[:400][None, :]
    pspec = (np.abs(np.fft.rfft(frames, 512)) ** 2) / 512
    fb = ds.mel_filterbank()
    energies = (pspec @ fb.T)[0]
    # the filter whose center is nearest 1 kHz should dominate
    centers_mel = np.linspace(ds._hz_to_mel(0), ds._hz_to_mel(sr / 2),
                              28)[1:-1]
    centers_hz = ds._mel_to_hz(centers_mel)
    expect = int(np.argmin(np.abs(centers_hz - 1000.0)))
    assert abs(int(np.argmax(energies)) - expect) <= 1


def test_dct_matrix_is_orthonormal():
    m = ds._dct2_ortho_matrix(26)
    np.testing.assert_allclose(m @ m.T, np.eye(26), atol=1e-10)


def test_context_stacking_zero_edges():
    sr = 16000
    audio = np.random.default_rng(1).normal(0, 0.1, sr)
    vec = ds.input_vectors(audio)
    # normalization shifts zeros too; instead check structure pre-norm
    feat = ds.mfcc(audio)[::2]
    padded = np.concatenate([np.zeros((9, 26), np.float32), feat,
                             np.zeros((9, 26), np.float32)])
    # first context vector = rows 0..18 of padded (9 zero rows first)
    first = padded[0:19].ravel()
    assert np.all(first[: 9 * 26] == 0)


def test_lstm_matches_numpy_reference():
    """_lstm_scan implements TF BasicLSTMCell (gates i,j,f,o,
    forget_bias 1.0) exactly."""
    key = jax.random.PRNGKey(2)
    units, cin, t = 8, 5, 7
    p = ds._lstm_init(key, cin, units)
    xs = jax.random.normal(jax.random.PRNGKey(3), (t, cin))
    got = np.asarray(ds._lstm_scan(p, xs))

    k = np.asarray(p["kernel"])
    b = np.asarray(p["bias"])
    x = np.asarray(xs)
    c = np.zeros(units)
    h = np.zeros(units)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    want = []
    for step in range(t):
        z = np.concatenate([x[step], h]) @ k + b
        i, j, f, o = np.split(z, 4)
        c = sig(f + 1.0) * c + sig(i) * np.tanh(j)
        h = sig(o) * np.tanh(c)
        want.append(h.copy())
    np.testing.assert_allclose(got, np.stack(want), atol=1e-5)

    # reverse=True runs back-to-front but returns time-ordered states
    got_bw = np.asarray(ds._lstm_scan(p, xs, reverse=True))
    c = np.zeros(units)
    h = np.zeros(units)
    want_bw = [None] * t
    for step in reversed(range(t)):
        z = np.concatenate([x[step], h]) @ k + b
        i, j, f, o = np.split(z, 4)
        c = sig(f + 1.0) * c + sig(i) * np.tanh(j)
        h = sig(o) * np.tanh(c)
        want_bw[step] = h.copy()
    np.testing.assert_allclose(got_bw, np.stack(want_bw), atol=1e-5)


def test_interpolation_and_windowing():
    feats = np.arange(50, dtype=np.float32)[:, None]     # 1 s at 50 Hz
    out = ds.interpolate_features(feats, 50.0, 25.0, 25)
    # linear: frame i at 25 fps sits at 50 Hz position 2i
    np.testing.assert_allclose(out[:, 0], 2.0 * np.arange(25), atol=1e-5)

    win = ds.window_features(out)
    assert win.shape == (25, 16, 1)
    # center convention: row i covers frames [i-8, i+8) zero-padded
    np.testing.assert_allclose(win[0, :8, 0], 0.0)
    np.testing.assert_allclose(win[0, 8, 0], out[0, 0])
    np.testing.assert_allclose(win[12, 0, 0], out[4, 0])


def test_extract_features_contract():
    """End-to-end: 16 kHz wav → (n_frames, 16, 29) — the exact shape
    data/dataset.py's HeadDataAudio consumes (ref dataset.py:404)."""
    params = ds.init_deepspeech(jax.random.PRNGKey(0))
    audio = np.random.default_rng(4).normal(0, 0.1, 16000)  # 1 s
    out = ds.extract_features(params, audio, fps=25.0, pad_to=64)
    assert out.shape == (25, 16, 29)
    assert np.isfinite(out).all()
    # explicit n_frames (video-locked) wins
    out2 = ds.extract_features(params, audio, fps=25.0, n_frames=30,
                               pad_to=64)
    assert out2.shape == (30, 16, 29)


def test_length_pad_does_not_change_logits():
    """Length-bucket zero padding must not leak into real outputs.
    With nonzero biases (any real checkpoint), unmasked pad rows feed
    the backward LSTM garbage state before it reaches the utterance —
    so compare padded vs unpadded logits under biased params."""
    params = ds.init_deepspeech(jax.random.PRNGKey(6))
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 1 else a, params)
    audio = np.random.default_rng(7).normal(0, 0.1, 16000)
    vec = jnp.asarray(ds.input_vectors(audio))
    t = vec.shape[0]
    exact = np.asarray(ds.deepspeech_apply(params, vec))
    padded = jnp.concatenate(
        [vec, jnp.zeros((128 - t % 128, vec.shape[1]), jnp.float32)])
    got = np.asarray(ds.deepspeech_apply(params, padded, t))[:t]
    np.testing.assert_allclose(got, exact, atol=1e-5)


def test_converter_roundtrip(tmp_path):
    """TF-name npz dump → pytree, with the documented layouts."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tools import convert_deepspeech as conv

    ref = ds.init_deepspeech(jax.random.PRNGKey(5))
    dump = {}
    for tf_name, (layer, part) in conv.NAME_MAP.items():
        if tf_name.endswith("|kernel") or tf_name.endswith("|bias"):
            continue  # alt spellings; use the 0.1.0 names only
        dump[tf_name] = np.asarray(ref[layer][part])
    got = conv.convert(dump)
    for layer, parts in ref.items():
        for part in parts:
            np.testing.assert_array_equal(got[layer][part],
                                          np.asarray(ref[layer][part]))
