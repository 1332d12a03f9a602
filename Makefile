# Developer entry points. The TPU smoke gate is the important one: the CPU
# test suite runs Pallas kernels in interpret mode only and cannot see
# device faults/hangs — run `make check-tpu` before every snapshot commit.

PY ?= python

.PHONY: test test-fast check-tpu bench bench-tiny install-smoke

test:
	$(PY) -m pytest tests/ -x -q

# Fast inner loop: skips multiprocess-distributed, inverse-rendering fits,
# and interpret-mode kernel suites (marked slow).
test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

# Packaging smoke (offline): build the wheel, install it into a fresh
# venv (runtime deps resolved from the dev env via PYTHONPATH — this
# image has no network), and import/build a scene with `flax` import
# BLOCKED to prove the core needs only the declared dependencies.
SITE := $(shell $(PY) -c "import site; print(site.getsitepackages()[0])")
install-smoke:
	rm -rf /tmp/rt_venv /tmp/rt_wheel
	$(PY) -m pip -q wheel -w /tmp/rt_wheel --no-deps --no-build-isolation .
	$(PY) -m venv /tmp/rt_venv
	/tmp/rt_venv/bin/pip -q install --no-deps /tmp/rt_wheel/*.whl
	cd /tmp && JAX_PLATFORMS=cpu PYTHONPATH=$(SITE) /tmp/rt_venv/bin/python -c "\
	import sys; \
	sys.modules['flax'] = None; \
	from raytracer_project_tpu.models import presets; \
	s = presets.shirley_final_scene(grid=2, with_bvh=True); \
	print('install-smoke ok:', s.primitive_count, 'prims')"

# Hard-timeout device smoke (tiny pooled render + compiled-Pallas vs MXU
# hit agreement). Exits nonzero fast on a kernel fault or hang.
check-tpu:
	timeout 420 $(PY) -m raytracer_project_tpu.utils.smoke

bench:
	$(PY) bench.py

bench-tiny:
	BENCH_WIDTH=128 BENCH_HEIGHT=72 BENCH_SPP=4 $(PY) bench.py
