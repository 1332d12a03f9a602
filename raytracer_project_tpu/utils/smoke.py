"""On-device smoke gate: fast fail for TPU kernel faults and hangs.

The CPU test suite runs Pallas kernels in interpret mode only, so a change
that compiles fine but faults or hangs on real TPU hardware sails through
CI (this is exactly what shipped in round 2: a scatter-add layout change
that hung a 128x72 @ 4 spp pooled render for >300 s while 110 CPU tests
stayed green; round 4 repeated it with the fused two-kernel step). This
module is the device gate, structured as named stages with FLUSHED
heartbeat prints so a watchdog timeout tail always identifies the stage
that wedged:

  fused-fast    64x36 @ 2 spp showcase through the FUSED two-kernel
                engine, compared against a committed CPU golden
                (tests/goldens/smoke_fused_64x36.npz) — one compile,
                intended to run after every kernel-touching commit
                (SMOKE_FAST=1 runs only this stage);
  fused-features  the same frame WITH fog + AOVs + reflection/
                refraction split passes through the fused engine —
                beauty/albedo/reflection each golden-compared (the
                fused paths the plain beauty stage never exercises);
  pool-render   128x72 @ 4 spp showcase through the UNFUSED pooled
                wavefront (RAYTRACER_TPU_NO_FUSED=1), compared against
                tests/goldens/smoke_pool_128x72.npz;
  hit-agree     compiled-Pallas vs MXU-matmul closest-hit agreement on
                real camera rays;
  bvh-traverse  threaded BVH traversal vs brute oracle on a 9k-sphere
                scene.

Run as ``python -m raytracer_project_tpu.utils.smoke`` (exits nonzero with
a diff on failure). ``bench.py`` shells out to it under a hard subprocess
timeout before timing anything: a hung device call cannot be interrupted
in-process, so the watchdog must sit one process up.

Golden comparison policy (two goldens per stage):

  smoke_<name>.npz       CPU golden — the SEMANTIC reference (interpret-
                         mode render, tools/make_smoke_goldens.py).
  smoke_<name>_tpu.npz   device golden — the REGRESSION reference
                         (compiled render on TPU, tools/
                         make_device_goldens.py).

On CPU the render is bit-equal to the CPU golden generator, so the CPU
check is tight (mean |diff| < 0.01, <1% of pixels >0.05 off). On TPU the
closest-hit kernels run their matmuls on the MXU, whose internal
accumulation order/precision is hardware-specific (measured: matches
neither correctly-rounded, sequential, nor pairwise-tree f32 on the
splitk digit sums) — so a compiled render CANNOT be bit-equal to the CPU
one, and path tracing is chaotic under FP reassociation: an ulp of t
difference flips a hit decision, reroutes the RNG stream, and yields an
independent radiance sample (measured: mean|d| ~ 0.035, ~8% speckle
pixels at 2 spp — pure speckle, verified by diff-map inspection). The
TPU check is therefore two-sided: TIGHT against the device golden
(same arithmetic, deterministic: mean < 1e-5 — catches any lowering /
kernel regression at full strength) and STATISTICAL against the CPU
golden (mean < 0.06, <20% speckle pixels — catches a systematically
wrong image, which puts 30-100% of pixels off at mean >= 0.1).
make_device_goldens.py refuses to write a device golden that fails the
statistical CPU check, so the tight reference can never legitimize a
systemically wrong device path.

Reference analog: none — the reference has no automated tests
(/root/reference, SURVEY.md section 4); this replaces its interactive
eyeball-the-image verification loop with a scriptable device check.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.perf_counter()


def _hb(msg: str) -> None:
    print(f"SMOKE [{time.perf_counter() - _T0:7.1f}s] {msg}", flush=True)


def _fail(msg: str) -> int:
    print(f"SMOKE FAIL: {msg}", file=sys.stderr, flush=True)
    return 1


def _golden_path(name: str) -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "tests", "goldens", f"{name}.npz")


# Cross-backend statistical budgets (TPU render vs CPU golden): measured
# MXU-vs-CPU speckle on the fused 64x36@2spp stage is mean ~0.035 /
# ~8% outlier pixels; a systematically wrong image runs mean >= 0.1 /
# 30-100% pixels (e.g. the round-5 one-hot default-precision bug).
_XBACKEND_MEAN = 0.06
_XBACKEND_FRAC = 0.20
# Device-golden budget: same arithmetic, deterministic executor — any
# visible drift is a real kernel/lowering change.
_DEVICE_MEAN = 1e-5


def _check_image(beauty: np.ndarray, golden_name: str, stage: str,
                 max_frac: float = 0.01):
    """Finite/nonzero always; golden comparison when goldens exist.

    max_frac: CPU-backend outlier-pixel budget. A systematically wrong
    image puts 30-100% of pixels off; chaotic per-sample RNG-branch flips
    produce uniform speckle whose density scales with how many knife-edge
    draws the config has (the fog + specular-classifier stage runs at
    ~2.5%, verified speckle by diff-map inspection — its budget is 4%).
    On TPU the two-golden policy applies (module docstring).

    Returns an error string or None.
    """
    if not np.isfinite(beauty).all():
        bad = int(np.count_nonzero(~np.isfinite(beauty)))
        return f"{stage}: non-finite pixels ({bad} bad values)"
    if beauty.max() <= 0.0:
        return f"{stage}: image is all-black"
    on_tpu = jax.default_backend() == "tpu"

    def _diff(ref):
        d = np.abs(beauty - ref)
        return float(d.mean()), float((d.max(axis=-1) > 0.05).mean())

    path = _golden_path(golden_name)
    cpu_ref = None
    if os.path.exists(path):
        cpu_ref = np.load(path)["beauty"]
        if cpu_ref.shape != beauty.shape:
            return (f"{stage}: golden shape {cpu_ref.shape} != render "
                    f"{beauty.shape}")
    if not on_tpu:
        if cpu_ref is None:
            _hb(f"{stage}: golden {golden_name} missing — "
                f"finite/nonzero only")
            return None
        mean_diff, frac_off = _diff(cpu_ref)
        _hb(f"{stage}: golden diff mean={mean_diff:.5f} "
            f"frac(>0.05)={frac_off:.4f} (budget {max_frac})")
        if mean_diff > 0.01 or frac_off > max_frac:
            return (f"{stage}: image disagrees with CPU golden "
                    f"(mean|d|={mean_diff:.5f} frac>0.05={frac_off:.4f})")
        return None

    # TPU: tight device-golden regression check ...
    dev_path = _golden_path(golden_name + "_tpu")
    if os.path.exists(dev_path):
        dev_ref = np.load(dev_path)["beauty"]
        if dev_ref.shape != beauty.shape:
            return (f"{stage}: device golden shape {dev_ref.shape} != "
                    f"render {beauty.shape}")
        mean_dev, frac_dev = _diff(dev_ref)
        _hb(f"{stage}: device-golden diff mean={mean_dev:.2e} "
            f"(budget {_DEVICE_MEAN:.0e})")
        if mean_dev > _DEVICE_MEAN:
            return (f"{stage}: device render drifted from device golden "
                    f"(mean|d|={mean_dev:.3e} frac>0.05={frac_dev:.4f} — "
                    f"kernel/lowering regression, or an intentional "
                    f"change needing tools/make_device_goldens.py)")
    else:
        _hb(f"{stage}: device golden {golden_name}_tpu missing — "
            f"statistical CPU check only")
    # ... plus the statistical cross-backend check.
    if cpu_ref is None:
        _hb(f"{stage}: golden {golden_name} missing — finite/nonzero only")
        return None
    mean_diff, frac_off = _diff(cpu_ref)
    _hb(f"{stage}: CPU-golden diff mean={mean_diff:.5f} "
        f"frac(>0.05)={frac_off:.4f} (budgets {_XBACKEND_MEAN}/"
        f"{_XBACKEND_FRAC})")
    if mean_diff > _XBACKEND_MEAN or frac_off > _XBACKEND_FRAC:
        return (f"{stage}: image systematically disagrees with CPU golden "
                f"(mean|d|={mean_diff:.5f} frac>0.05={frac_off:.4f})")
    return None


def _showcase(width: int, height: int):
    from ..models import camera as cam_mod
    from ..models import environment as env_mod
    from ..models import presets

    scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
    cam = cam_mod.make_camera(
        image_width=width, image_height=height, vfov=30.0,
        lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0),
        defocus_angle=0.0, focus_dist=10.0,
    )
    env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                                   sun_intensity=6.0)
    return scene, cam, env


def render_fused_fast():
    """The fused-fast stage's render: [(golden_name, label, max_frac,
    img)] — shared by the stage and the golden generators."""
    from ..models import environment as env_mod
    from ..ops import fused_step, integrator

    scene, cam, env = _showcase(64, 36)
    cfg = integrator.RenderConfig(
        width=64, height=36, samples_per_pixel=2, max_depth=10,
        env_mode=env_mod.PHYSICAL_SUN,
        use_albedo=False, use_normal=False, use_z_depth=False,
        wavefront=True,
    )
    on_tpu = jax.default_backend() == "tpu"
    if not fused_step.fused_supported(scene, cfg, True, env):
        raise RuntimeError("fused-fast: showcase no longer fused_supported")
    _hb(f"fused-fast: compiling+running 64x36@2spp "
        f"(backend={jax.default_backend()}, fused "
        f"{'compiled' if on_tpu else 'interpret'})")
    fn = jax.jit(
        lambda s, c, e, k: fused_step.render_pool_fused(
            s, c, e, k, cfg, interpret=not on_tpu),
        static_argnums=(),
    )
    acc = fn(scene, cam, env, jax.random.PRNGKey(0))
    beauty = np.asarray(acc.beauty, np.float32) / cfg.samples_per_pixel
    beauty = beauty.reshape(36, 64, 3)
    _hb(f"fused-fast: done, mean={beauty.mean():.4f}")
    return [("smoke_fused_64x36", "fused-fast", 0.01, beauty)]


def stage_fused_fast() -> int:
    """64x36 @ 2 spp showcase through the fused engine (one compile)."""
    try:
        images = render_fused_fast()
    except RuntimeError as e:
        return _fail(str(e))
    for name, label, max_frac, img in images:
        err = _check_image(img, name, label, max_frac=max_frac)
        if err:
            return _fail(err)
    return 0


def render_fused_features():
    """64x36 @ 2 spp showcase WITH fog through the fused engine with
    every optional channel on (albedo/normal/z AOVs + reflection/
    refraction split passes + in-kernel media sampling) — the fused
    code paths the plain beauty stage never exercises."""
    import dataclasses

    from ..models import environment as env_mod
    from ..models import presets
    from ..models import camera as cam_mod
    from ..ops import fused_step, integrator

    scene = presets.showcase_scene(with_bvh=True, with_meshes=True,
                                   use_fog=True, fog_density=0.02)
    cam = cam_mod.make_camera(
        image_width=64, image_height=36, vfov=30.0,
        lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0),
        defocus_angle=0.0, focus_dist=10.0,
    )
    env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                                   sun_intensity=6.0)
    # 4 spp (vs the beauty stage's 2): the fog free-flight and the
    # specular classifier make this config maximally chaotic under FP
    # reassociation; the extra samples keep honest per-lane flips inside
    # the golden gate's 1% outlier budget.
    cfg = integrator.RenderConfig(
        width=64, height=36, samples_per_pixel=4, max_depth=10,
        env_mode=env_mod.PHYSICAL_SUN,
        use_albedo=True, use_normal=True, use_z_depth=True,
        use_reflection=True, use_refraction=True,
        wavefront=True,
    )
    on_tpu = jax.default_backend() == "tpu"
    if not fused_step.fused_supported(scene, cfg, True, env):
        raise RuntimeError("fused-features: fog showcase not "
                           "fused_supported")
    _hb(f"fused-features: compiling+running 64x36@2spp fog+AOV+spec "
        f"(fused {'compiled' if on_tpu else 'interpret'})")
    acc = jax.jit(
        lambda s, c, e, k: fused_step.render_pool_fused(
            s, c, e, k, cfg, interpret=not on_tpu)
    )(scene, cam, env, jax.random.PRNGKey(0))
    aux = min(cfg.aux_samples, cfg.samples_per_pixel)
    out = []
    for name, div in (("beauty", cfg.samples_per_pixel), ("albedo", aux),
                      ("reflection", cfg.samples_per_pixel)):
        img = np.asarray(getattr(acc, name), np.float32) / div
        img = img.reshape(36, 64, 3)
        _hb(f"fused-features: {name} mean={img.mean():.4f}")
        out.append((f"smoke_features_{name}_64x36",
                    f"fused-features:{name}", 0.04, img))
    return out


def stage_fused_features() -> int:
    try:
        images = render_fused_features()
    except RuntimeError as e:
        return _fail(str(e))
    for name, label, max_frac, img in images:
        err = _check_image(img, name, label, max_frac=max_frac)
        if err:
            return _fail(err)
    return 0


def render_pool():
    """128x72 @ 4 spp showcase through the UNFUSED pooled wavefront."""
    from ..models import environment as env_mod
    from ..ops import integrator

    scene, cam, env = _showcase(128, 72)
    cfg = integrator.RenderConfig(
        width=128, height=72, samples_per_pixel=4, max_depth=10,
        env_mode=env_mod.PHYSICAL_SUN,
        use_albedo=False, use_normal=False, use_z_depth=False,
        wavefront=True,
    )
    _hb("pool-render: compiling+running 128x72@4spp (unfused pool)")
    os.environ["RAYTRACER_TPU_NO_FUSED"] = "1"  # read at trace time
    try:
        render = jax.jit(integrator.render, static_argnames="config")
        out = render(scene, cam, env, jax.random.PRNGKey(0), cfg)
        beauty = np.asarray(out["beauty"], np.float32)
    finally:
        del os.environ["RAYTRACER_TPU_NO_FUSED"]
    _hb(f"pool-render: done, mean={beauty.mean():.4f}")
    return [("smoke_pool_128x72", "pool-render", 0.01, beauty)]


def stage_pool_render() -> int:
    for name, label, max_frac, img in render_pool():
        err = _check_image(img, name, label, max_frac=max_frac)
        if err:
            return _fail(err)
    return 0


def stage_hit_agree() -> int:
    """Compiled Pallas kernel vs the EXACT brute oracle on real rays.

    The oracle is intersect_brute — pure f32 VPU arithmetic with no MXU
    involvement, so it is deterministic and context-independent. (The
    XLA mm scan is NOT usable as a device reference: XLA fuses its
    split-digit dots plus the partial add into one MXU accumulation
    chain inside scan contexts, reintroducing exactly the
    mixed-magnitude accumulation noise the SPLITK two-pass split avoids
    — measured 170/512 winner flips vs the kernel, all from the mm
    side's ~1e-4-level noise under grazing-ray amplification.)

    Budgets, calibrated on the showcase camera (Pallas SPLITK vs brute:
    0/512 hit flips, 9/512 winner flips; same-winner relative t error
    p50 3e-6 / p99 5e-3 / max 1.7e-2 — the tail is rotated-box slab
    divisions at near-edge-on faces, where an ulp of MXU-vs-VPU
    difference amplifies through 1/d_local; the ground-sphere c
    coefficient has the same property): hit flips <= 1%, winner flips
    <= 2.5%, same-winner t: <= 3% of rays over 5e-3 relative and none
    over 5e-2. A real kernel bug (wrong table layout, dropped digit
    block) puts 30-100% of rays off by O(1).
    """
    from ..core import rng as rng_mod
    from ..models import camera as cam_mod
    from ..ops import intersect

    scene, cam, _ = _showcase(128, 72)
    n = 512
    px = jax.random.randint(jax.random.PRNGKey(7), (n,), 0, 128 * 72)
    lanes = rng_mod.lane_rng(jax.random.PRNGKey(8), px)
    o, d = cam_mod.generate_rays(cam, lanes, px, width=128)
    tmin = jnp.float32(1e-3)

    _hb("hit-agree: 512 rays, pallas kernel vs exact brute oracle")
    if jax.default_backend() == "tpu":
        from ..ops import pallas_intersect
        hit_p = jax.jit(
            lambda o, d: pallas_intersect.intersect_brute_pallas(
                scene, o, d, tmin))(o, d)
    else:
        # No device: assert mm vs classic brute agreement so the gate
        # does *something* useful on CPU.
        hit_p = jax.jit(
            lambda o, d: intersect.intersect_brute_mm(scene, o, d,
                                                      tmin))(o, d)
    hit_o = jax.jit(
        lambda o, d: intersect.intersect_brute(scene, o, d, tmin))(o, d)

    hp, ho = np.asarray(hit_p.hit), np.asarray(hit_o.hit)
    n_hit_flip = int((hp != ho).sum())
    if n_hit_flip > max(2, n // 100):
        bad = np.nonzero(hp != ho)[0][:8]
        return _fail(f"hit-agree: {n_hit_flip}/{n} hit-set mismatches, "
                     f"rays {bad.tolist()} (kernel={hp[bad].tolist()} "
                     f"oracle={ho[bad].tolist()})")
    both = hp & ho
    tp, to = np.asarray(hit_p.t)[both], np.asarray(hit_o.t)[both]
    idp = np.asarray(hit_p.prim_idx)[both]
    ido = np.asarray(hit_o.prim_idx)[both]
    typ = np.asarray(hit_p.prim_type)[both]
    tyo = np.asarray(hit_o.prim_type)[both]
    same_winner = (idp == ido) & (typ == tyo)
    n_winner = int((~same_winner).sum())
    if n_winner > max(2, n // 40):
        return _fail(f"hit-agree: {n_winner}/{n} winner flips exceed the "
                     f"knife-edge budget {max(2, n // 40)}")
    tp_s, to_s = tp[same_winner], to[same_winner]
    rel = np.abs(tp_s - to_s) / np.maximum(np.abs(to_s), 1e-3)
    frac_t = float((rel > 5e-3).mean())
    if frac_t > 0.03 or (rel.size and rel.max() > 5e-2):
        worst = int(np.argmax(rel))
        return _fail(f"hit-agree: same-winner t drift out of budget "
                     f"(frac>5e-3 = {frac_t:.2%}, max rel = "
                     f"{rel.max():.3g}; worst kernel={tp_s[worst]:.6f} "
                     f"oracle={to_s[worst]:.6f})")
    _hb(f"hit-agree: ok, hits={int(both.sum())}/{n}, hit flips "
        f"{n_hit_flip}, winner flips {n_winner}, frac(rel>5e-3) "
        f"{frac_t:.4f}")
    return 0


def stage_bvh_traverse() -> int:
    """Threaded BVH traversal on device vs brute oracle (large scene)."""
    from ..core import rng as rng_mod
    from ..models import camera as cam_mod
    from ..models import presets
    from ..ops import intersect, traverse

    _hb("bvh-traverse: building 9k-sphere stress scene")
    big = presets.bvh_stress_scene(n_spheres=9000, with_bvh=True)
    assert big.bvh is not None
    cam2 = cam_mod.make_camera(image_width=128, image_height=72, vfov=35.0,
                               lookfrom=(5.0, 6.0, 6.0),
                               lookat=(5.0, 4.0, -12.0))
    n = 512
    px = jax.random.randint(jax.random.PRNGKey(7), (n,), 0, 128 * 72)
    lanes = rng_mod.lane_rng(jax.random.PRNGKey(8), px)
    o2, d2 = cam_mod.generate_rays(cam2, lanes, px, width=128)
    tmin = jnp.float32(1e-3)
    _hb("bvh-traverse: compiling+running traversal vs oracle")
    # Oracle = classic brute (exact VPU): the mm scan's MXU passes are
    # context-dependently fused by XLA on TPU (see stage_hit_agree).
    hit_b = jax.jit(
        lambda o, d: traverse.intersect_bvh(big, o, d, tmin))(o2, d2)
    hit_o = jax.jit(
        lambda o, d: intersect.intersect_brute(big, o, d, tmin))(o2, d2)
    hb, ho = np.asarray(hit_b.hit), np.asarray(hit_o.hit)
    if not (hb == ho).all():
        bad = np.nonzero(hb != ho)[0][:8]
        return _fail(f"bvh-traverse: hit-set mismatch at rays {bad.tolist()}")
    tb = np.asarray(hit_b.t)[hb & ho]
    to = np.asarray(hit_o.t)[hb & ho]
    if not np.allclose(tb, to, rtol=2e-4, atol=2e-4):
        return _fail(f"bvh-traverse: t mismatch max|dt|="
                     f"{np.abs(tb - to).max():.3e}")
    _hb(f"bvh-traverse: ok, hits={int((hb & ho).sum())}/{n}")
    return 0


def run_smoke() -> int:
    fast = bool(os.environ.get("SMOKE_FAST"))
    _hb(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"mode={'fast' if fast else 'full'}")
    stages = [("fused-fast", stage_fused_fast)]
    if not fast:
        stages += [("fused-features", stage_fused_features),
                   ("pool-render", stage_pool_render),
                   ("hit-agree", stage_hit_agree),
                   ("bvh-traverse", stage_bvh_traverse)]
    for name, fn in stages:
        _hb(f"stage {name}: start")
        rc = fn()
        if rc:
            return rc
        _hb(f"stage {name}: PASS")
    print(f"SMOKE OK: backend={jax.default_backend()} "
          f"stages={[n for n, _ in stages]}", flush=True)
    return 0


def main() -> int:
    return run_smoke()


if __name__ == "__main__":
    sys.exit(main())
