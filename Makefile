# Developer entry points. The TPU smoke gate is the important one: the CPU
# test suite runs Pallas kernels in interpret mode only and cannot see
# device faults/hangs — run `make check-tpu` before every snapshot commit.

PY ?= python

.PHONY: test check-tpu bench bench-tiny

test:
	$(PY) -m pytest tests/ -x -q

# Hard-timeout device smoke (tiny pooled render + compiled-Pallas vs MXU
# hit agreement). Exits nonzero fast on a kernel fault or hang.
check-tpu:
	timeout 420 $(PY) -m raytracer_project_tpu.utils.smoke

bench:
	$(PY) bench.py

bench-tiny:
	BENCH_WIDTH=128 BENCH_HEIGHT=72 BENCH_SPP=4 $(PY) bench.py
