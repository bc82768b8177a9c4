"""Convert the public DeepSpeech 0.1.0 checkpoint to the JAX pytree.

The reference extracts `aud.npy` with AD-NeRF's DeepSpeech tooling
(reference README.md:41), which runs the Mozilla
`deepspeech-0.1.0-models` TF graph. TensorFlow is not in this image, so
the converter consumes a plain .npz dump of the checkpoint's variables
(TF variable name → array), produced on any TF-enabled machine with:

    import tensorflow as tf, numpy as np
    r = tf.train.load_checkpoint("models/ckpt")
    np.savez("ds_vars.npz", **{k.replace("/", "|"): r.get_tensor(k)
        for k in r.get_variable_to_shape_map()})

Mapping (TF 0.1.0 graph names → hfa_gp_tpu/preprocess/deepspeech.py):
  h1..h3, h5, h6/b* dense kernels are (cin, cout) in TF — copied as-is
  (our dense is x @ W + b with the same layout).
  bidirectional_rnn/{fw,bw}/basic_lstm_cell/weights|biases →
  lstm_{fw,bw}.kernel|bias — TF BasicLSTMCell stores one
  (cin+units, 4*units) kernel with gate order (i, j, f, o) and adds
  forget_bias=1.0 at run time; our cell uses the identical layout and
  convention (deepspeech._lstm_scan), so no reordering is needed.

Usage: python tools/convert_deepspeech.py ds_vars.npz out.npz
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


NAME_MAP = {
    "h1": ("h1", "weight"), "b1": ("h1", "bias"),
    "h2": ("h2", "weight"), "b2": ("h2", "bias"),
    "h3": ("h3", "weight"), "b3": ("h3", "bias"),
    "h5": ("h5", "weight"), "b5": ("h5", "bias"),
    "h6": ("logits", "weight"), "b6": ("logits", "bias"),
    "bidirectional_rnn|fw|basic_lstm_cell|weights": ("lstm_fw", "kernel"),
    "bidirectional_rnn|fw|basic_lstm_cell|biases": ("lstm_fw", "bias"),
    "bidirectional_rnn|bw|basic_lstm_cell|weights": ("lstm_bw", "kernel"),
    "bidirectional_rnn|bw|basic_lstm_cell|biases": ("lstm_bw", "bias"),
    # newer name spellings of the same variables
    "bidirectional_rnn|fw|basic_lstm_cell|kernel": ("lstm_fw", "kernel"),
    "bidirectional_rnn|fw|basic_lstm_cell|bias": ("lstm_fw", "bias"),
    "bidirectional_rnn|bw|basic_lstm_cell|kernel": ("lstm_bw", "kernel"),
    "bidirectional_rnn|bw|basic_lstm_cell|bias": ("lstm_bw", "bias"),
}


def convert(vars_npz: dict) -> dict:
    """{tf_name('|'-separated): array} → deepspeech params pytree."""
    from hfa_gp_tpu.preprocess import deepspeech as ds

    out = {}
    for tf_name, arr in vars_npz.items():
        key = tf_name.replace("/", "|")
        if key not in NAME_MAP:
            continue
        layer, part = NAME_MAP[key]
        out.setdefault(layer, {})[part] = np.asarray(arr, np.float32)

    required = {"h1", "h2", "h3", "h5", "logits", "lstm_fw", "lstm_bw"}
    missing = required - set(out)
    if missing:
        raise ValueError(f"checkpoint dump is missing layers: {missing}")
    # shape sanity vs the in-repo architecture
    ref = ds.init_deepspeech(__import__("jax").random.PRNGKey(0))
    for layer, parts in ref.items():
        for part, arr in parts.items():
            got = out[layer][part].shape
            want = tuple(arr.shape)
            assert got == want, (layer, part, got, want)
    return out


def main():
    src, dst = sys.argv[1], sys.argv[2]
    from hfa_gp_tpu.utils import pytree_io
    data = dict(np.load(src))
    params = convert(data)
    pytree_io.save_pytree(dst, params)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
