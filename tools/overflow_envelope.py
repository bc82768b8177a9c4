"""Fine-pass slab overflow envelope for the windowed sampler.

The coarse pass windows consecutive stratified depths (tight footprints
by construction — tools/footprint.py). The FINE pass windows consecutive
importance-sampled depths, whose spread depends on the density field:
unimodal surfaces concentrate them (tighter than coarse), silhouette
rays are bimodal and can straddle. This tool builds synthetic weight
fields (smooth head-like depth map / hard two-shell bimodal split) with
the real FFHQ camera geometry and reports, per candidate fine-slab, the
fraction of blocks whose in-plane footprint exceeds the slab (those
corners read zeros).

Run on CPU (pure prepass geometry).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from hfa_gp_tpu.core import camera as cam  # noqa: E402
from hfa_gp_tpu.core.pallas import triplane as tp  # noqa: E402
from hfa_gp_tpu.models.eg3d import renderer as rnd  # noqa: E402

B, RES, ND, HW = 4, 128, 48, 256


def main():
    key = jax.random.PRNGKey(0)
    label = cam.sample_camera_label(key, n=B, r=2.7,
                                    horizontal_stddev=0.3,
                                    vertical_stddev=0.2, mode="normal")
    c2w, intr = cam.unpack_label(cam.flip_yz_label(label))
    ro, rd = cam.generate_rays(c2w, intr, RES)
    depths_c = rnd.sample_stratified(ro, 2.25, 3.3, ND)

    ii = (jnp.arange(RES) + 0.5) / RES - 0.5
    yy, xx = jnp.meshgrid(ii, ii, indexing="ij")
    # smooth "head" depth map: sphere-ish bump + background plane
    r2 = (xx ** 2 + yy ** 2) / 0.18
    surf = jnp.where(r2 < 1.0, 2.65 - 0.25 * jnp.sqrt(1 - r2), 3.15)
    surf = surf.reshape(1, -1, 1, 1)

    scenarios = {}
    d = depths_c[..., :-1, :]
    # unimodal: gaussian weight bump around the surface depth
    scenarios["unimodal surface"] = jnp.exp(
        -((d - surf) ** 2) / (2 * 0.03 ** 2))
    # bimodal silhouette: half the energy on a near shell, half far
    scenarios["bimodal silhouette"] = (
        jnp.exp(-((d - 2.45) ** 2) / (2 * 0.02 ** 2))
        + jnp.exp(-((d - 3.1) ** 2) / (2 * 0.02 ** 2)))
    # uniform: importance == stratified (random-weights init)
    scenarios["uniform (random init)"] = jnp.ones_like(d)

    for name, w in scenarios.items():
        fine = rnd.sample_importance(depths_c, w, ND)
        pts = (ro[:, :, None, :] + fine * rd[:, :, None, :])
        coords = pts.reshape(B, -1, 3)
        for slab in [(48, 64), (64, 80), (80, 96), (64, 96)]:
            _, _, _, ovf = tp.plan_blocks(
                coords, rnd._PLANE_INV, 1.0, res=RES, n_depth=ND,
                plane_hw=HW, tile=16, depth_window=4, slab=slab)
            frac = float(jnp.mean(ovf.astype(jnp.float32)))
            print(f"{name:22s} slab {slab}: overflow {frac:.5f}",
                  flush=True)


def per_point_impact():
    """Per-POINT error of the windowed sampler vs exact bilinear on the
    unimodal-surface fine distribution (the worst block-overflow case):
    what fraction of fine samples actually lose corners, and how large
    is the feature error."""
    import numpy as np
    key = jax.random.PRNGKey(0)
    label = cam.sample_camera_label(key, n=B, r=2.7,
                                    horizontal_stddev=0.3,
                                    vertical_stddev=0.2, mode="normal")
    c2w, intr = cam.unpack_label(cam.flip_yz_label(label))
    ro, rd = cam.generate_rays(c2w, intr, RES)
    depths_c = rnd.sample_stratified(ro, 2.25, 3.3, ND)
    ii = (jnp.arange(RES) + 0.5) / RES - 0.5
    yy, xx = jnp.meshgrid(ii, ii, indexing="ij")
    r2 = (xx ** 2 + yy ** 2) / 0.18
    surf = jnp.where(r2 < 1.0, 2.65 - 0.25 * jnp.sqrt(1 - r2), 3.15)
    w = jnp.exp(-((depths_c[..., :-1, :]
                   - surf.reshape(1, -1, 1, 1)) ** 2) / (2 * 0.03 ** 2))
    fine = rnd.sample_importance(depths_c, w, ND)
    coords = (ro[:, :, None, :] + fine * rd[:, :, None, :]).reshape(B, -1, 3)

    planes = jax.random.normal(jax.random.PRNGKey(7),
                               (B, 3, HW, HW, 32)) * 0.5
    ref = rnd.sample_from_planes(planes, coords, 1.0)
    got = tp.sample_from_planes_windowed(
        planes, coords, 1.0, rnd._PLANE_INV, res=RES, n_depth=ND,
        tile=16, depth_window=4, slab=(64, 80), interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    ref_mag = np.abs(np.asarray(ref)).mean()
    per_pt = err.max(axis=-1)            # (B, 3, M)
    bad = per_pt > 0.05
    print(f"unimodal fine pass, slab (64,80): "
          f"points with any corner lost: {bad.mean():.5f}; "
          f"mean|err| {err.mean():.5f} vs mean|ref| {ref_mag:.3f}; "
          f"p99.9 per-point err {np.percentile(per_pt, 99.9):.4f}",
          flush=True)


def coarse_envelope(n_pose: int = 16):
    """Overflow of the COARSE slab candidates over many sampled poses —
    both the stratified coarse pass and the windowed-STRATIFIED fine
    pass use cfg.sampler_slab, so shrinking it (r3 lead: sy 40→36)
    must hold across the pose distribution AND a worst-case importance
    field for the fine placement."""
    ii = (jnp.arange(RES) + 0.5) / RES - 0.5
    yy, xx = jnp.meshgrid(ii, ii, indexing="ij")
    r2 = (xx ** 2 + yy ** 2) / 0.18
    surf = jnp.where(r2 < 1.0, 2.65 - 0.25 * jnp.sqrt(1 - r2), 3.15)
    surf = surf.reshape(1, -1, 1, 1)

    # (slab, x_align): 16 = bf16 planes, 8 = the fp32 narrow-slab
    # variant (same guaranteed span; the tail loses offset luck, so
    # measure it)
    for slab, xal in [((40, 48), 16), ((40, 40), 8), ((36, 48), 16),
                      ((36, 40), 8), ((32, 48), 16)]:
        worst_c = worst_f = 0.0
        for seed in range(n_pose):
            key = jax.random.PRNGKey(seed)
            label = cam.sample_camera_label(key, n=B, r=2.7,
                                            horizontal_stddev=0.3,
                                            vertical_stddev=0.2,
                                            mode="normal")
            c2w, intr = cam.unpack_label(cam.flip_yz_label(label))
            ro, rd = cam.generate_rays(c2w, intr, RES)
            kj = jax.random.fold_in(key, 99)
            depths_c = rnd.sample_stratified(ro, 2.25, 3.3, ND, rng=kj)
            pts = (ro[:, :, None, :] + depths_c * rd[:, :, None, :])
            _, _, _, ovf = tp.plan_blocks(
                pts.reshape(B, -1, 3), rnd._PLANE_INV, 1.0, res=RES,
                n_depth=ND, plane_hw=HW, tile=16, depth_window=4,
                slab=slab, x_align=xal)
            worst_c = max(worst_c,
                          float(jnp.mean(ovf.astype(jnp.float32))))
            # windowed-stratified fine on a sharp unimodal surface
            w = jnp.exp(-((depths_c[..., :-1, :] - surf) ** 2)
                        / (2 * 0.03 ** 2))
            fine = rnd.sample_importance_windowed(
                depths_c, w, n_windows=ND // 4, n_per=4,
                ray_start=2.25, ray_end=3.3,
                rng=jax.random.fold_in(key, 7))
            ptsf = (ro[:, :, None, :] + fine * rd[:, :, None, :])
            _, _, _, ovf = tp.plan_blocks(
                ptsf.reshape(B, -1, 3), rnd._PLANE_INV, 1.0, res=RES,
                n_depth=ND, plane_hw=HW, tile=16, depth_window=4,
                slab=slab, x_align=xal)
            worst_f = max(worst_f,
                          float(jnp.mean(ovf.astype(jnp.float32))))
        print(f"coarse slab {slab} align {xal}: "
              f"worst coarse overflow {worst_c:.5f}"
              f"  worst strat-fine overflow {worst_f:.5f} "
              f"({n_pose} pose draws x {B} cams)", flush=True)


if __name__ == "__main__":
    if "coarse" in sys.argv[1:]:
        coarse_envelope()
    else:
        per_point_impact()
