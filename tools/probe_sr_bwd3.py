"""SR img-chain decomposition (r5): the 3-channel torgb + FIR-upsample
skip chain costs ~19 ms fwd+bwd at batch 2 (probe_sr_bwd2.py: full 42.5
vs no-img-chain 23.5). Attribute it: each torgb, the 3-channel depthwise
FIR upsample, and a dense-diagonal-kernel variant of that upsample.

Usage: python tools/probe_sr_bwd3.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hfa_gp_tpu.core import ops
from hfa_gp_tpu.models.eg3d import networks as nets

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 20
DT = jnp.bfloat16
FIR = ops.make_fir_kernel((1, 3, 3, 1))


def timed(name, fn, *a):
    t0 = time.perf_counter()
    v = float(fn(*a))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000 - 33.0 / ITERS
    print(f"{name}: {dt:.2f} ms  (compile {c:.0f}s, last={v:.3f})",
          flush=True)


def torgb_case(name, res, cin):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, res, res, cin), DT)
    p = nets._init_torgb(jax.random.PRNGKey(1), cin, 3, 512)
    w = jax.random.normal(jax.random.PRNGKey(2), (B, 512))

    def loss(p_, x_):
        y = nets.torgb_apply(p_, x_, w, conv_clamp=256.0)
        return jnp.mean(jnp.abs(y.astype(jnp.float32)))

    g = jax.jit(lambda p_, x_: sum(
        jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(
            jax.grad(loss, argnums=(0, 1))(p_, x_))))
    timed(f"{name} torgb {res}^2 {cin}->3 fwd+bwd", g, p, x)


torgb_case("sr b0", 256, 256)
torgb_case("sr b1", 512, 128)


def up3_case():
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 256, 256, 3),
                            jnp.float32)
    g = jax.jit(lambda i_: jnp.sum(jnp.abs(
        jax.grad(lambda x_: jnp.mean(jnp.abs(
            ops.upsample2d(x_, FIR))))(i_))))
    timed("img upsample2d 3ch 256->512 fwd+bwd (depthwise)", g, img)


up3_case()


def upsample2d_dense3(x, kernel, factor=2):
    """upsample2d for a 3-channel image via ONE dense conv whose kernel
    is diag(k) over channels — avoids feature_group_count=3 whose fwd
    AND AD-transposed convs hit the TPU's depthwise path at 3 lanes."""
    kh = np.asarray(kernel).shape[0]
    p0 = (kh + factor - 1) // 2
    p1 = (kh - factor) // 2
    k = jnp.asarray(kernel, x.dtype) * jnp.asarray(float(factor) ** 2,
                                                   x.dtype)
    k = jnp.flip(k, (0, 1))
    c = x.shape[-1]
    kern = jnp.einsum("hw,ij->hwij", k, jnp.eye(c, dtype=x.dtype))
    pads = ((p0, p1 + factor - 1), (p0, p1 + factor - 1))
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=pads,
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def up3_dense_case():
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 256, 256, 3),
                            jnp.float32)
    a = ops.upsample2d(img, FIR)
    b_ = upsample2d_dense3(img, FIR)
    err = float(jnp.max(jnp.abs(a - b_)))
    print(f"dense-diag parity max err: {err:.2e}", flush=True)
    g = jax.jit(lambda i_: jnp.sum(jnp.abs(
        jax.grad(lambda x_: jnp.mean(jnp.abs(
            upsample2d_dense3(x_, FIR))))(i_))))
    timed("img upsample 3ch 256->512 fwd+bwd (dense diag)", g, img)


up3_dense_case()
print("DONE", flush=True)
