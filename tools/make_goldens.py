"""Generate the checked-in golden renders for tests/test_goldens.py.

Run from the repo root:  python tools/make_goldens.py

Renders the four BASELINE.json render configs at thumbnail scale on the
deterministic CPU backend and stores them under tests/goldens/ as
compressed .npz. Seeds, shapes and tolerances are the policy documented in
tests/test_goldens.py — regenerate ONLY when an intentional image-affecting
change lands, and say so in the commit message.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_goldens import GOLDEN_DIR, RENDERS  # noqa: E402


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in RENDERS.items():
        img = np.asarray(fn()["beauty"], np.float32)
        assert np.isfinite(img).all(), name
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, beauty=img)
        print(f"{name}: {img.shape} mean={img.mean():.4f} -> {path}")


if __name__ == "__main__":
    main()
