"""Time pallas CC kernel vs feasibility stats vs packing on the real chip."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.ops.projection import project_point_cloud
from lego_loam_tpu.ops.ground import apply_ground
from lego_loam_tpu.ops import segmentation as S
from lego_loam_tpu.ops.pallas_cc import pallas_label_prop

def timeit(fn, *a, reps=30, name=""):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms", flush=True)

def main():
    cfg = vlp16()
    poses = straight_trajectory(8, speed=0.3, yaw_rate=0.02)
    grids = []
    for i, (R, t) in enumerate(poses):
        pts = render_scan(R, t, cfg, noise=0.01, seed=11+i)
        n = cfg.laser.max_points
        buf = np.zeros((n,3),np.float32); m = np.zeros((n,),bool)
        k = min(len(pts),n); buf[:k]=np.nan_to_num(pts[:k]); m[:k]=np.isfinite(pts[:k]).all(axis=1)
        g = jax.jit(lambda p,mm: project_point_cloud(p,mm,cfg))(jnp.asarray(buf),jnp.asarray(m))
        grids.append(jax.jit(lambda g,kk: apply_ground(g,cfg,kk))(g, jax.random.PRNGKey(i)))
    g0 = grids[0]

    conn = jax.jit(lambda g: S._connectivity(g, g.valid & (g.ground != 1), cfg))
    l, r, u, d = conn(g0)
    cand = g0.valid & (g0.ground != 1)
    timeit(lambda: pallas_label_prop(l, r, u, d, cand), name="pallas_label_prop (kernel only)")
    timeit(jax.jit(lambda g: S.converged_labels(g, cfg)), g0, name="connectivity + kernel")
    timeit(jax.jit(lambda g: S.label_components(g, cfg)), g0, name="label_components (+feasibility stats)")
    timeit(jax.jit(lambda g: S.segment_cloud(g, cfg)), g0, name="segment_cloud (+packing+outliers)")

if __name__ == "__main__":
    main()
