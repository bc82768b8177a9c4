"""Additive micro-probes for the v4 (lane-major) sampler over the
t16 d4 slab(40,48) structure (NB=9216, P=1024, K4=480)."""
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
TILE, DW, SY, SX, GROUP = 16, 4, 40, 48, 4


def t(name, fn, *a, iters=5):
    t0 = time.perf_counter(); v = float(fn(*a)); c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*a))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:7.1f} ms   (compile {c:.0f}s)", flush=True)
    return dt


def make_kernel(*, do_dma=True, do_wbuild=True, do_matmul=True,
                do_epi=True, const_slab=False, fp32_dot=False,
                no_where=False, single_w=False):
    sy4 = SY // 4
    k4 = sy4 * SX

    def kernel(origins_ref, txy_ref, planes_ref, out_ref, slab_ref,
               sem_ref, *, group, n_blocks):
        i = pl.program_id(0)

        def dma(j, slot):
            word = origins_ref[j]
            oy4 = (word >> 10) & 0x3FF
            ox = pl.multiple_of(word & 0x3FF, 16)
            return pltpu.make_async_copy(
                planes_ref.at[word >> 20, pl.ds(oy4, sy4),
                              pl.ds(ox, SX), :],
                slab_ref.at[slot], sem_ref.at[slot])

        if do_dma:
            @pl.when(i == 0)
            def _():
                dma(0, 0).start()

        base = i * group
        vv = jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0) // SX
        xx = (jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0)
              % SX).astype(jnp.float32)
        s_const = slab_ref[0].reshape(k4, 4 * C).astype(jnp.bfloat16)

        def body(gi, carry):
            j = base + gi
            slot = jax.lax.rem(j, 2)
            if do_dma:
                @pl.when(j + 1 < n_blocks)
                def _():
                    dma(j + 1, jax.lax.rem(j + 1, 2)).start()
                dma(j, slot).wait()

            px = txy_ref[gi, 0:1, :]
            py = txy_ref[gi, 1:2, :]
            y0 = jnp.floor(py)
            va = jnp.floor(y0 / 4.0).astype(jnp.int32)
            vb = jnp.floor((y0 + 1.0) / 4.0).astype(jnp.int32)
            wdt = jnp.float32 if fp32_dot else jnp.bfloat16
            if do_wbuild:
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(xx - px))
                if no_where:
                    wa = tx.astype(wdt)
                    wb = (tx + 1.0).astype(wdt)
                else:
                    wa = jnp.where(vv == va, tx, 0.0).astype(wdt)
                    wb = jnp.where((vv == vb) & (vb != va), tx,
                                   0.0).astype(wdt)
            else:
                wa = (xx * px).astype(wdt)
                wb = (xx * py).astype(wdt)
            if single_w:
                wb = wa
            if do_matmul:
                if const_slab:
                    s = s_const
                else:
                    s = slab_ref[slot].reshape(k4, 4 * C)
                    s = s.astype(jnp.float32 if fp32_dot
                                 else jnp.bfloat16)
                dn = (((0,), (0,)), ((), ()))
                fa = jax.lax.dot_general(
                    s, wa, dn, preferred_element_type=jnp.float32)
                if single_w:
                    fb = fa
                else:
                    fb = jax.lax.dot_general(
                        s, wb, dn, preferred_element_type=jnp.float32)
            else:
                fa = jnp.tile(wa[:128].astype(jnp.float32), (1, 1))
                fb = jnp.tile(wb[:128].astype(jnp.float32), (1, 1))
            if do_epi:
                acc = jnp.zeros((C, py.shape[1]), jnp.float32)
                vaf = va.astype(jnp.float32) * 4.0
                vbf = vb.astype(jnp.float32) * 4.0
                for r in range(4):
                    tya = jnp.maximum(0.0, 1.0 - jnp.abs(vaf + r - py))
                    tyb = jnp.maximum(0.0, 1.0 - jnp.abs(vbf + r - py))
                    acc = acc + tya * fa[r * C:(r + 1) * C, :] \
                        + tyb * fb[r * C:(r + 1) * C, :]
            else:
                acc = fa[:C, :] + fb[:C, :]
            out_ref[gi, :, :] = acc
            return carry

        jax.lax.fori_loop(0, group, body, 0)
    return kernel


def run(name, planes, coords, **kw):
    def path(planes, coords):
        plan, txy, org, _ = tp.plan_blocks(
            coords, rnd._PLANE_INV, 1.0, res=RES, n_depth=ND, plane_hw=HW,
            tile=TILE, depth_window=DW, slab=(SY, SX))
        pq = tp.quad_pack_planes(planes.astype(jnp.bfloat16))
        nb = plan.n_blocks
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb // GROUP,),
            in_specs=[pl.BlockSpec((GROUP, 2, plan.points),
                                   lambda i, o: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((GROUP, C, plan.points),
                                   lambda i, o: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, SY // 4, SX, 4 * C),
                                       jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((2,))])
        out = pl.pallas_call(
            functools.partial(make_kernel(**kw), group=GROUP,
                              n_blocks=nb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, C, plan.points),
                                           jnp.float32),
        )(org, txy, pq)
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

    run("full              ", planes, coords)
    run("fp32-dot          ", planes, coords, fp32_dot=True)
    run("no-where          ", planes, coords, no_where=True)
    run("single-w          ", planes, coords, single_w=True)
    run("single-w+no-where ", planes, coords, single_w=True,
        no_where=True)


if __name__ == "__main__":
    main()
