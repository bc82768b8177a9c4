"""Is the up=2 modulated conv (lhs_dilation zero-stuffing) paying for
the zero positions? Compare against a plain conv of equal useful FLOPs
and a subpixel (conv → depth_to_space) formulation."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import ops

B, H, CIN, COUT = 8, 128, 128, 128


def t(name, fn, *a, iters=10):
    t0 = time.perf_counter(); v = float(fn(*a)); c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*a))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:7.2f} ms "
          f"(compile {c:.0f}s val {v:.0f})", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, H, CIN), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, CIN, COUT), jnp.bfloat16) * 0.05
    s = jax.random.normal(key, (B, CIN), jnp.bfloat16)

    def up2(x, w, s):
        return jnp.sum(jnp.abs(ops.modulated_conv2d(
            x, w, s, up=2, demodulate=True).astype(jnp.float32)))
    t("modulated up=2 (lhs_dilation+FIR)", jax.jit(up2), x, w, s)

    def plain(x, w, s):
        y = ops.modulated_conv2d(x, w, s, up=1, padding=1,
                                 demodulate=True)
        return jnp.sum(jnp.abs(y.astype(jnp.float32)))
    t("modulated up=1 same in-res      ", jax.jit(plain), x, w, s)

    # plain conv at the OUTPUT resolution (the upper bound a perfect
    # up=2 should approach: same useful MACs as zero-stuffed conv / 4)
    x2 = jax.random.normal(key, (B, 2 * H, 2 * H, CIN), jnp.bfloat16)

    def plain2(x2, w):
        y = jax.lax.conv_general_dilated(
            x2, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.abs(y.astype(jnp.float32)))
    t("plain conv at 2H res            ", jax.jit(plain2), x2, w)

    # subpixel: 3x3 kernel zero-embedded into 4 phase kernels of 2x2
    def subpixel(x, w, s):
        xs = x * s[:, None, None, :]
        # build (2,2,CIN,4*COUT) phase kernels from the 3x3
        wp = jnp.zeros((4, 4, CIN, COUT), w.dtype)
        wp = wp.at[1:4, 1:4].set(w)
        # phase (i,j) output at (2y+i, 2x+j) uses taps w[ky,kx] with
        # ky ≡ ... — emulate by strided slices of the 4x4 embedding
        phases = []
        for i in range(2):
            for j in range(2):
                phases.append(wp[i::2, j::2])        # (2,2,CIN,COUT)
        wph = jnp.concatenate(phases, axis=-1)       # (2,2,CIN,4COUT)
        y = jax.lax.conv_general_dilated(
            xs, wph, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, wd, _ = y.shape
        y = y.reshape(b, h, wd, 2, 2, COUT)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wd, COUT)
        return jnp.sum(jnp.abs(y.astype(jnp.float32)))
    t("subpixel conv->depth_to_space   ", jax.jit(subpixel), x, w, s)


if __name__ == "__main__":
    main()
