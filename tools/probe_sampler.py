"""Ablation probe for the windowed sampler: which of {DMA, W-build,
matmul} owns the per-block time. Variants run the same grid/blocks with
pieces removed."""
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hfa_gp_tpu.core import camera as cam
from hfa_gp_tpu.core.pallas import triplane as tp
from hfa_gp_tpu.models.eg3d import renderer as rnd

B, RES, ND, HW, C = 4, 128, 48, 256, 32
TILE, DW, SLAB, GROUP = 8, 4, 32, 16


def t(name, fn, *a, iters=5):
    t0 = time.perf_counter(); v = float(fn(*a)); c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*a))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:7.1f} ms   (compile {c:.0f}s)", flush=True)
    return dt


def kernel(origins_ref, txy_ref, planes_ref, out_ref, slab_ref, sem_ref,
           *, slab, channels, c_pad, group, n_blocks,
           do_dma=True, do_wbuild=True, do_matmul=True, do_txy=True,
           do_out=True):
    i = pl.program_id(0)

    def dma(j, slot):
        word = origins_ref[j]
        return pltpu.make_async_copy(
            planes_ref.at[word >> 20, pl.ds((word >> 10) & 0x3FF, slab),
                          pl.ds(word & 0x3FF, slab), :],
            slab_ref.at[slot], sem_ref.at[slot])

    if do_dma:
        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

    base = i * group
    p = txy_ref.shape[1]
    k = slab * slab
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    yr = (jj // slab).astype(jnp.float32)
    xc = (jj % slab).astype(jnp.float32)

    def body(gi, carry):
        j = base + gi
        slot = jax.lax.rem(j, 2)
        if do_dma:
            @pl.when(j + 1 < n_blocks)
            def _():
                dma(j + 1, jax.lax.rem(j + 1, 2)).start()
            dma(j, slot).wait()

        if do_txy:
            px = txy_ref[gi, :, 0:1]
            py = txy_ref[gi, :, 1:2]
        else:
            px = jnp.full((p, 1), 3.25, jnp.float32)
            py = jnp.full((p, 1), 5.75, jnp.float32)
        if do_wbuild:
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(yr - py))
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(xc - px))
            w = (ty * tx).astype(jnp.bfloat16)
        else:
            w = (px * py).astype(jnp.bfloat16) * jnp.ones(
                (1, k), jnp.bfloat16)
        if do_matmul:
            s = slab_ref[slot].reshape(k, c_pad).astype(jnp.bfloat16)
            res = jnp.dot(w, s, preferred_element_type=jnp.float32)
        else:
            res = w.astype(jnp.float32)
        if do_out:
            out_ref[gi, :, :] = res[:, :channels]
        else:
            @pl.when(gi == 0)
            def _():
                out_ref[0, :, :] = res[:, :channels]
        return carry

    jax.lax.fori_loop(0, group, body, 0)


def run(name, planes, coords, **ablate):
    def path(planes, coords):
        b, n3, hw, _, c = planes.shape
        plan, txy, org, _ = tp.plan_blocks(
            coords, rnd._PLANE_INV, 1.0, res=RES, n_depth=ND, plane_hw=hw,
            tile=TILE, depth_window=DW, slab=SLAB)
        pf = planes.reshape(b * n3, hw, hw, c)
        c_pad = 128
        pf = jnp.pad(pf, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
        nb = plan.n_blocks
        s = SLAB
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb // GROUP,),
            in_specs=[pl.BlockSpec((GROUP, plan.points, 2),
                                   lambda i, o: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((GROUP, plan.points, c),
                                   lambda i, o: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, s, s, c_pad), pf.dtype),
                            pltpu.SemaphoreType.DMA((2,))])
        out = pl.pallas_call(
            functools.partial(kernel, slab=s, channels=c, c_pad=c_pad,
                              group=GROUP, n_blocks=nb, **ablate),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, plan.points, c),
                                           jnp.float32),
        )(org, txy, pf)
        return jnp.sum(jnp.abs(out))
    t(name, jax.jit(path), planes, coords)


def main():
    key = jax.random.PRNGKey(0)
    kp, kc = jax.random.split(key)
    planes = jax.random.normal(kp, (B, 3, HW, HW, C), jnp.float32) * 0.5
    label = cam.sample_camera_label(kc, n=B, r=2.7, horizontal_stddev=0.3,
                                    vertical_stddev=0.2, mode="normal")
    c2w, intr = cam.unpack_label(cam.flip_yz_label(label))
    ro, rd = cam.generate_rays(c2w, intr, RES)
    depths = jnp.linspace(2.25, 3.3, ND)
    pts = ro[:, :, None, :] + depths[None, None, :, None] * rd[:, :, None, :]
    coords = pts.reshape(B, -1, 3)

    run("full", planes, coords)
    run("no-txy", planes, coords, do_txy=False)
    run("no-out", planes, coords, do_out=False)
    run("no-txy-no-out", planes, coords, do_txy=False, do_out=False)
    run("bare (dma+mm only)", planes, coords, do_txy=False, do_out=False,
        do_wbuild=False)
    run("nothing", planes, coords, do_txy=False, do_out=False,
        do_wbuild=False, do_matmul=False, do_dma=False)


if __name__ == "__main__":
    main()
