import jax, jax.numpy as jnp
from raytracer_project_tpu.models import camera as cam_mod, presets
from raytracer_project_tpu.ops import pallas_binned as pb
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.core.constants import T_MIN
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
W, H = 800, 448
N = W * H
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
ids = jnp.arange(N, dtype=jnp.int32)
lr = rng.lane_rng(jax.random.PRNGKey(0), ids)
o, d = jax.jit(cam_mod.generate_rays, static_argnums=3)(cam, lr, ids, W)
f_bin = jax.jit(lambda o, d: pb.intersect_brute_binned(scene, o, d, T_MIN))
h = jax.block_until_ready(f_bin(o, d))
with jax.profiler.trace('/tmp/jtrace'):
    jax.block_until_ready(f_bin(o, d))
