"""Pool-vs-chunked equivalence check (CPU)."""
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.models import presets, camera as cam_mod, environment as env_mod
from raytracer_project_tpu.ops import integrator

scene = presets.shirley_final_scene(grid=3)
cfg = dict(width=48, height=32, samples_per_pixel=8, max_depth=6,
           env_mode=env_mod.PHYSICAL_SUN,
           use_reflection=True, use_refraction=True)
cam = cam_mod.make_camera(image_width=48, image_height=32, vfov=20,
                          lookfrom=(13, 2, 3), lookat=(0, 0, 0),
                          defocus_angle=0.6, focus_dist=10.0)
env = env_mod.make_environment(sun_direction=(0.4, 0.6, 0.2), sun_intensity=6.0)
key = jax.random.PRNGKey(7)

c1 = integrator.RenderConfig(**cfg)
c2 = integrator.RenderConfig(**cfg, wavefront=True, pool_lanes=1024)

r1 = jax.jit(integrator.render, static_argnames='config')(scene, cam, env, key, c1)
r2 = jax.jit(integrator.render, static_argnames='config')(scene, cam, env, key, c2)

for k in r1:
    a, b = np.asarray(r1[k]), np.asarray(r2[k])
    err = np.max(np.abs(a - b))
    rel = err / (np.abs(a).max() + 1e-9)
    print(f"{k:12s} max|diff| {err:.3e}  rel {rel:.3e}  mean {a.mean():.4f} vs {b.mean():.4f}")
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
print("POOL == CHUNKED (within float-order tolerance)")
