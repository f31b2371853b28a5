import os
os.environ['JAX_PLATFORMS']='cpu'
import jax, jax.numpy as jnp, numpy as np
from open3d_tpu.data import synthetic
from open3d_tpu.geometry import voxel_block_grid as vbg_mod

depths, colors, extr, intr = synthetic.render_sequence(3, span=0.1)
vbg = vbg_mod.create(voxel_size=0.03, block_count=4096, sdf_trunc=8*0.03/2, with_color=False)

@jax.jit
def integ(vbg, depth, extrinsic):
    keys,_ = vbg_mod.compute_unique_block_coordinates(vbg, depth, intr, extrinsic, depth_max=6.0, frame_block_capacity=2048)
    return vbg_mod.integrate(vbg, keys, depth, None, intr, extrinsic, depth_max=6.0)

@jax.jit
def rc(vbg, extrinsic):
    return vbg_mod.raycast(vbg, intr, extrinsic, depth_max=6.0, max_steps=120, with_color=False)

for i in range(3):
    vbg = integ(vbg, depths[i], extr[i])
ray = rc(vbg, extr[1])
d_gt = depths[1]
valid = (ray.depth>0)&(d_gt>0)
err = np.abs(np.asarray(jnp.where(valid, ray.depth-d_gt, 0.0)))[np.asarray(valid)]
print('frac_valid', float(jnp.mean(valid.astype(jnp.float32))))
print('mae', err.mean(), 'median', np.median(err), 'p90', np.percentile(err,90), 'p99', np.percentile(err,99), 'max', err.max())
print('frac > 5cm', (err>0.05).mean())
