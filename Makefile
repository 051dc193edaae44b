# Convenience targets (the reference wraps its test runs in test/makefile)

.PHONY: test test-fast test-quick endround bench native clean

test: native
	python -m pytest tests/ -q

# Iteration loop: drop the marked-slow tiers (fuzz sweeps, convergence,
# process grids, 25-device covering) — ~1/4 the wall time of `make test`.
test-quick: native
	python -m pytest tests/ -q -m "not slow"

test-fast: native
	python -m pytest tests/ -q -x -k "not conservation and not golden"

# End-of-round gate (VERDICT r4 #1): the FULL suite must be green on the
# tree being snapshotted — an unexecuted test must never ship. Run this
# before the final commit of a round; it fails loudly if anything is red.
# The graft-contract legs force the CPU platform BEFORE any backend init
# (the axon TPU plugin overrides JAX_PLATFORMS, and a backend pinned by a
# prior jit cannot be switched — entry() before dryrun_multichip() in one
# process would pin the TPU and the 8-device virtual mesh would fail),
# and run in separate processes so neither leg inherits the other's init.
endround: native
	python -m pytest tests/ -q
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -c "import jax; jax.config.update('jax_platforms', 'cpu'); \
	             import __graft_entry__ as g; g.entry()"
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -c "import jax; jax.config.update('jax_platforms', 'cpu'); \
	             import __graft_entry__ as g; g.dryrun_multichip(8)"
	@echo "ENDROUND GATE: suite green + graft contracts OK"

bench:
	python bench.py

bench-configs:
	python scripts/bench_configs.py

native:
	$(MAKE) -C armon_tpu/native

clean:
	$(MAKE) -C armon_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
