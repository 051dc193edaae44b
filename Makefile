# Convenience targets (the reference wraps its test runs in test/makefile)

.PHONY: test test-fast bench native clean

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -k "not conservation and not golden"

bench:
	python bench.py

bench-configs:
	python scripts/bench_configs.py

native:
	$(MAKE) -C armon_tpu/native

clean:
	$(MAKE) -C armon_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
