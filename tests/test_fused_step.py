"""Fused pooled-wavefront step (ops/fused_step.py): equivalence with the
unfused pool, end-to-end in Pallas interpret mode.

The fused path reimplements record decode (one-hot matmul), shading, sky,
RNG, and respawn inside two kernels; these tests pin it to
wavefront.render_pool (itself pinned to the chunked integrator) over a
mixed-primitive scene with textures, bump maps, and all material families,
in every environment mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import fused_step, integrator, wavefront

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene():
    rng_np = np.random.default_rng(7)
    b = SceneBuilder()
    tex = b.textures.add_image(
        rng_np.uniform(0.1, 0.9, size=(16, 24, 3)).astype(np.float32))
    bump = b.textures.add_image(
        rng_np.uniform(0, 1, size=(16, 16, 3)).astype(np.float32))
    checker = b.textures.add_checker(0.7, (0.9, 0.9, 0.2), (0.1, 0.1, 0.4))
    red = b.materials.lambertian("red", (0.7, 0.2, 0.1), bump_id=bump,
                                 bump_strength=2.0)
    wood = b.materials.lambertian("wood", texture_id=tex)
    check = b.materials.lambertian("check", texture_id=checker)
    mirror = b.materials.metal("mirror", (0.9, 0.8, 0.7), fuzz=0.1)
    glass = b.materials.dielectric("glass", 1.5, albedo=(0.95, 0.99, 0.9))
    lamp = b.materials.diffuse_light("lamp", (4.0, 3.0, 2.0))
    b.geometry.add_sphere((0.0, -100.5, 0.0), 100.0, check)
    b.geometry.add_sphere((0.0, 0.5, 0.0), 0.5, glass)
    b.geometry.add_sphere((-1.2, 0.5, 0.0), 0.5, mirror)
    b.geometry.add_sphere((1.2, 0.5, 0.0), 0.5, red)
    b.geometry.add_sphere((0.0, 2.2, -0.5), 0.6, lamp)
    b.geometry.add_box((-2.5, 0.0, -1.5), (-1.8, 0.9, -0.8), wood)
    b.geometry.add_triangles(
        np.asarray([[-0.8, 0.0, 1.0]], np.float32),
        np.asarray([[0.8, 0.0, 1.0]], np.float32),
        np.asarray([[0.0, 1.2, 0.9]], np.float32), wood)
    return b.build(with_bvh=False)


def _cfg(mode, w=48, h=27, spp=4):
    return integrator.RenderConfig(
        width=w, height=h, samples_per_pixel=spp, max_depth=6, env_mode=mode,
        use_albedo=False, use_normal=False, use_z_depth=False, wavefront=True)


def _cam(w, h):
    return cam_mod.make_camera(image_width=w, image_height=h, vfov=40.0,
                               lookfrom=(0.0, 1.0, 4.0),
                               lookat=(0.0, 0.5, 0.0))


@pytest.mark.parametrize("mode,envkw", [
    (env_mod.PHYSICAL_SUN, dict(sun_direction=(0.3, 0.8, 0.2),
                                sun_intensity=4.0)),
    (env_mod.SOLID_COLOR, dict(background_color=(0.2, 0.3, 0.5),
                               intensity=1.3)),
    (env_mod.HDR_MAP, dict(
        hdr_image=np.linspace(0, 2, 8 * 16 * 3,
                              dtype=np.float32).reshape(8, 16, 3),
        hdri_rotation=0.5, hdri_tilt=0.2, hdri_roll=0.1, intensity=0.8)),
])
def test_fused_matches_pool(scene, key, mode, envkw):
    cfg = _cfg(mode)
    cam = _cam(cfg.width, cfg.height)
    env = env_mod.make_environment(**envkw)
    pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    assert fused_step.fused_supported(scene, cfg, True)
    ref = wavefront.render_pool(scene, cam, env, key, cfg, pixel_ids)
    out = fused_step.render_pool_fused(scene, cam, env, key, cfg,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out.beauty),
                               np.asarray(ref.beauty), rtol=3e-4, atol=3e-4)


def test_fused_stats_and_progressive(scene, key):
    """Segment stats flow through, and a sample_offset render matches the
    unfused pool at the same offset (progressive accumulation)."""
    cfg = _cfg(env_mod.PHYSICAL_SUN, spp=2)
    cam = _cam(cfg.width, cfg.height)
    env = env_mod.make_environment(sun_direction=(0.3, 0.8, 0.2),
                                   sun_intensity=4.0)
    pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    ref, rs = wavefront.render_pool(scene, cam, env, key, cfg, pixel_ids,
                                    sample_offset=3, with_stats=True)
    out, fs = fused_step.render_pool_fused(scene, cam, env, key, cfg,
                                           sample_offset=3, with_stats=True,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(out.beauty),
                               np.asarray(ref.beauty), rtol=3e-4, atol=3e-4)
    assert int(fs["segments"]) == int(rs["segments"])
    assert int(fs["steps"]) > 0


def test_fused_supported_gates(scene):
    cfg = _cfg(env_mod.PHYSICAL_SUN)
    assert fused_step.fused_supported(scene, cfg, True)
    assert not fused_step.fused_supported(scene, cfg, False)
    cfg_spec = integrator.RenderConfig(
        width=48, height=27, samples_per_pixel=4, max_depth=6,
        env_mode=env_mod.PHYSICAL_SUN, use_albedo=False, use_normal=False,
        use_z_depth=False, use_reflection=True, wavefront=True)
    assert fused_step.fused_supported(scene, cfg_spec, True)
    # Solid-albedo fog is fused-covered (kernel-B media sampling).
    bf = SceneBuilder()
    m = bf.materials.lambertian("g", (0.5, 0.5, 0.5))
    bf.geometry.add_sphere((0.0, 0.0, 0.0), 1.0, m)
    bf.add_fog_sphere((0, 0, 0), 5.0, 0.1, (0.8, 0.8, 0.8))
    fog_scene = bf.build(with_bvh=False)
    assert fused_step.fused_supported(fog_scene, cfg, True)


def test_fused_aov_buffers(scene, key):
    """AOV channels (albedo/normal/z) through the fused step match the
    unfused pool. Beauty uses a tie-robust comparison: the kernels'
    polynomial acos/atan2 (~1e-5 rad; Mosaic has no exact arcs) can flip
    a nearest-neighbor bump texel on an exact boundary, diverging a few
    paths — bounded here to <0.5% of channel values."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(env_mod.PHYSICAL_SUN), use_albedo=True,
                              use_normal=True, use_z_depth=True)
    cam = _cam(cfg.width, cfg.height)
    env = env_mod.make_environment(sun_direction=(0.3, 0.8, 0.2),
                                   sun_intensity=4.0)
    pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    assert fused_step.fused_supported(scene, cfg, True)
    ref = wavefront.render_pool(scene, cam, env, key, cfg, pixel_ids)
    out = fused_step.render_pool_fused(scene, cam, env, key, cfg,
                                       interpret=True)
    for name in ("albedo", "normal", "z_depth"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=3e-4, atol=1e-3, err_msg=name)
    d = np.abs(np.asarray(out.beauty) - np.asarray(ref.beauty))
    assert d.mean() < 1e-3
    assert (d > 3e-3).mean() < 0.005


def test_fused_spec_passes(scene, key):
    """Reflection/refraction split passes through the fused step match the
    unfused pool (same routing flags, firefly clamp, attn0 modulation)."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(env_mod.PHYSICAL_SUN),
                              use_reflection=True, use_refraction=True)
    cam = _cam(cfg.width, cfg.height)
    env = env_mod.make_environment(sun_direction=(0.3, 0.8, 0.2),
                                   sun_intensity=4.0)
    pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    assert fused_step.fused_supported(scene, cfg, True)
    ref = wavefront.render_pool(scene, cam, env, key, cfg, pixel_ids)
    out = fused_step.render_pool_fused(scene, cam, env, key, cfg,
                                       interpret=True)
    for name in ("beauty", "reflection", "refraction"):
        d = np.abs(np.asarray(getattr(out, name))
                   - np.asarray(getattr(ref, name)))
        assert d.mean() < 1e-3, f"{name} mean {d.mean()}"
        assert (d > 3e-3).mean() < 0.005, f"{name} outliers"


def test_fused_sample_chunking(scene, key):
    """Sample-chunked fused accumulation (wavefront.render_pool's path for
    renders above the fused work-id cap) is bit-identical to one call:
    chunk sums at matching sample_offsets == a single full-spp call,
    because lane RNG streams are (pixel, sample)-keyed."""
    cfg = _cfg(env_mod.PHYSICAL_SUN, spp=4)
    cam = _cam(cfg.width, cfg.height)
    env = env_mod.make_environment(sun_direction=(0.3, 0.8, 0.2),
                                   sun_intensity=4.0)
    import dataclasses

    one = fused_step.render_pool_fused(scene, cam, env, key, cfg,
                                       interpret=True)
    cfg2 = dataclasses.replace(cfg, samples_per_pixel=2)
    a = fused_step.render_pool_fused(scene, cam, env, key, cfg2,
                                     sample_offset=0, interpret=True)
    b = fused_step.render_pool_fused(scene, cam, env, key, cfg2,
                                     sample_offset=2, interpret=True)
    chunked = jax.tree.map(jnp.add, a, b)
    np.testing.assert_allclose(np.asarray(chunked.beauty),
                               np.asarray(one.beauty), rtol=2e-5, atol=2e-5)


def test_fused_spp_chunk_values(scene):
    cfg = _cfg(env_mod.PHYSICAL_SUN, spp=4)
    chunk = fused_step.fused_spp_chunk(scene, cfg)
    assert chunk >= cfg.samples_per_pixel  # tiny render: no chunking
    assert chunk == (fused_step._TOTAL_WORK_CAP - 1) // (2 * cfg.n_pixels)
    # A 1080p render must chunk (VERDICT r4 item 6: the north-star config
    # rides the fused engine via spp chunks).
    cfg_hd = integrator.RenderConfig(
        width=1920, height=1080, samples_per_pixel=1024, max_depth=10,
        env_mode=env_mod.PHYSICAL_SUN, use_albedo=False, use_normal=False,
        use_z_depth=False, wavefront=True)
    chunk_hd = fused_step.fused_spp_chunk(scene, cfg_hd)
    assert 0 < chunk_hd < 1024


def test_fused_window_sharded_invariance(scene, key):
    """The fused engine inside shard_map over per-shard pixel WINDOWS
    (pixel_offset = shard * n_local) matches the 1-device fused render on
    the unpadded region — VERDICT r4 item 4: the fast engine must be
    reachable under sharding. Interpret mode on the virtual CPU mesh."""
    import functools

    from jax.sharding import Mesh, PartitionSpec as P

    cfg = _cfg(env_mod.PHYSICAL_SUN, w=40, h=25, spp=2)  # n=1000: pads
    cam = _cam(cfg.width, cfg.height)
    env = env_mod.make_environment(sun_direction=(0.3, 0.8, 0.2),
                                   sun_intensity=4.0)
    one = fused_step.render_pool_fused(scene, cam, env, key, cfg,
                                       interpret=True)

    n_dev = 8
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), axis_names=("tiles",))
    n = cfg.n_pixels
    n_local = -(-n // n_dev)
    padded = n_local * n_dev

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=P("tiles"), check_vma=False,
    )
    def shard_fn(scene_, cam_, env_, key_):
        poff = jax.lax.axis_index("tiles").astype(jnp.int32) * n_local
        return fused_step.render_pool_fused(
            scene_, cam_, env_, key_, cfg, interpret=True,
            pixel_offset=poff, n_pixels_local=n_local)

    sharded = shard_fn(scene, cam, env, key)
    assert sharded.beauty.shape[0] == padded
    np.testing.assert_allclose(np.asarray(sharded.beauty)[:n],
                               np.asarray(one.beauty), rtol=2e-5, atol=2e-5)


def test_sharded_accumulate_identity_window(scene, key):
    """parallel.render.sharded_accumulate recognizes the clamped-identity
    id pattern and produces the same sums as the unsharded pool (the
    shard path that now feeds the fused engine on TPU)."""
    from raytracer_project_tpu.parallel import render as prender

    cfg = _cfg(env_mod.PHYSICAL_SUN, w=40, h=25, spp=2)
    cam = _cam(cfg.width, cfg.height)
    env = env_mod.make_environment(sun_direction=(0.3, 0.8, 0.2),
                                   sun_intensity=4.0)
    mesh = prender.make_mesh(8)
    ids = prender._padded_pixel_ids(cfg.n_pixels, 8)
    assert not isinstance(ids, jax.Array)  # host-known -> window path
    out, stats = prender.sharded_accumulate(
        scene, cam, env, key, cfg, ids, 0, mesh=mesh, with_stats=True)
    ref = wavefront.render_pool(scene, cam, env, key, cfg, None)
    np.testing.assert_allclose(
        np.asarray(out.beauty)[:cfg.n_pixels], np.asarray(ref.beauty),
        rtol=2e-5, atol=2e-5)
    assert float(stats["segments"]) > 0


def test_fused_fog_matches_pool(scene, key):
    """Solid-albedo fog through the fused step (kernel-B media sampling)
    matches the unfused pool — VERDICT r4 item 5. Chaos-tolerant bound:
    the free-flight draw makes per-lane paths sensitive, so compare with
    the same outlier budget as the AOV test."""
    import dataclasses

    from raytracer_project_tpu.models.scene import SceneBuilder

    bf = SceneBuilder()
    ground = bf.materials.lambertian("ground", (0.5, 0.6, 0.5))
    lamp = bf.materials.diffuse_light("lamp", (5.0, 4.0, 3.0))
    glass = bf.materials.dielectric("glass", 1.5)
    bf.geometry.add_sphere((0.0, -100.5, 0.0), 100.0, ground)
    bf.geometry.add_sphere((0.0, 0.5, 0.0), 0.5, glass)
    bf.geometry.add_sphere((0.0, 2.2, -0.5), 0.6, lamp)
    bf.geometry.add_box((-2.0, 0.0, -1.5), (-1.2, 0.9, -0.7), ground)
    bf.add_fog_sphere((0.0, 0.5, 0.0), 4.0, 0.15, (0.85, 0.9, 0.95))
    bf.add_fog_box((1.0, 0.0, -1.0), (2.0, 1.2, 0.2), 0.4, (0.9, 0.6, 0.5))
    fog_scene = bf.build(with_bvh=False)

    cfg = _cfg(env_mod.PHYSICAL_SUN, w=48, h=27, spp=4)
    cam = _cam(cfg.width, cfg.height)
    env = env_mod.make_environment(sun_direction=(0.3, 0.8, 0.2),
                                   sun_intensity=4.0)
    assert fused_step.fused_supported(fog_scene, cfg, True)
    import os
    os.environ["RAYTRACER_TPU_NO_FUSED"] = "1"
    try:
        ref = wavefront.render_pool(fog_scene, cam, env, key, cfg, None)
    finally:
        del os.environ["RAYTRACER_TPU_NO_FUSED"]
    out = fused_step.render_pool_fused(fog_scene, cam, env, key, cfg,
                                       interpret=True)
    d = np.abs(np.asarray(out.beauty) - np.asarray(ref.beauty))
    assert d.mean() < 1e-3, f"fog beauty mean {d.mean()}"
    assert (d > 3e-3).mean() < 0.005, "fog beauty outliers"
