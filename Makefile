# Developer surface — the analog of the reference's justfile
# (`justfile:29-52`: test / test-race / bench / bench-ci targets).
# Tests run on a CPU mesh (tests/conftest.py forces the CPU backend and
# an 8-device virtual mesh); benches run on the real TPU chip.

PY ?= python

.PHONY: test test-fast examples bench bench-ci roofline scaling native \
        dryrun entry clean

# Full suite (~35 min on CPU). For parallel shells, run pytest on two
# halves of tests/test_*.py yourself (order does not matter).
test:
	$(PY) -m pytest tests/ -q

# Fast signal: core numerics, designers, one engine file, conv/spectrum
# (examples run separately via `make examples`)
test-fast:
	$(PY) -m pytest tests/test_core.py tests/test_design.py \
	  tests/test_biquad.py tests/test_spectrum.py tests/test_conv.py -q

examples:
	$(PY) -m pytest tests/test_examples.py -q

# Headline metric: ONE JSON line (driver contract), real TPU
bench:
	$(PY) bench.py

# Full measured suite -> stdout table (real TPU)
bench-ci:
	$(PY) benchmarks/run_benchmarks.py

roofline:
	$(PY) benchmarks/run_benchmarks.py --roofline

# DP weak-scaling efficiency on the virtual CPU mesh
scaling:
	$(PY) benchmarks/scaling.py --backend cpu --devices 8

# C++ golden kernels + SPSC ring
native:
	$(MAKE) -C native

# Driver-visible checks
dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 $(PY) -c "\
	import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

entry:
	$(PY) -c "import __graft_entry__ as g; fn, args = g.entry(); \
	  import jax; print(jax.jit(fn).lower(*args).compile() and 'entry ok')"

clean:
	rm -rf /tmp/jax_cache __pycache__ .pytest_cache

# On-TPU smoke validation: engine-vs-oracle checks on the real device
# (the CPU pytest suite's complement; see tools/tpu_smoke.py)
smoke-tpu:
	$(PY) tools/tpu_smoke.py
