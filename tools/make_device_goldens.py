"""Generate the DEVICE goldens the on-device smoke gate compares against.

Run from the repo root ON A TPU HOST:  python tools/make_device_goldens.py

Produces tests/goldens/smoke_*_tpu.npz — compiled-on-TPU renders of the
exact stage computations in utils/smoke.py. The smoke gate compares
subsequent TPU renders against these TIGHTLY (mean |diff| < 1e-5): the
device executor is deterministic, so any drift is a kernel/lowering
change. Regenerate ONLY on an intentional image-affecting change, and say
so in the commit message.

Safety interlock: each device golden is checked against its CPU golden
(tests/goldens/smoke_*.npz) with the smoke gate's cross-backend
statistical budgets before being written — a systemically wrong device
path (not mere MXU-reassociation speckle) fails generation instead of
being enshrined as the reference.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from raytracer_project_tpu.utils import smoke  # noqa: E402


def main() -> int:
    if jax.default_backend() != "tpu":
        print("make_device_goldens: needs a TPU backend "
              f"(got {jax.default_backend()})", file=sys.stderr)
        return 1
    gdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(gdir, exist_ok=True)

    images = (smoke.render_fused_fast() + smoke.render_fused_features()
              + smoke.render_pool())
    rc = 0
    for name, label, _max_frac, img in images:
        cpu_path = os.path.join(gdir, f"{name}.npz")
        if os.path.exists(cpu_path):
            ref = np.load(cpu_path)["beauty"]
            d = np.abs(img - ref)
            mean_d = float(d.mean())
            frac = float((d.max(axis=-1) > 0.05).mean())
            print(f"{name}: vs CPU golden mean|d|={mean_d:.5f} "
                  f"frac(>0.05)={frac:.4f}")
            if mean_d > smoke._XBACKEND_MEAN or frac > smoke._XBACKEND_FRAC:
                print(f"{name}: REFUSING device golden — device render "
                      f"systematically disagrees with the CPU golden "
                      f"(budgets {smoke._XBACKEND_MEAN}/"
                      f"{smoke._XBACKEND_FRAC})", file=sys.stderr)
                rc = 1
                continue
        else:
            print(f"{name}: no CPU golden to cross-check "
                  f"(run tools/make_smoke_goldens.py first)",
                  file=sys.stderr)
            rc = 1
            continue
        np.savez_compressed(os.path.join(gdir, f"{name}_tpu.npz"),
                            beauty=np.asarray(img, np.float32))
        print(f"{name}_tpu: written (mean={img.mean():.4f})")
    return rc


if __name__ == "__main__":
    sys.exit(main())
