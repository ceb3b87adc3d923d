# Common targets for mqgan_tpu. No install needed in-tree:
#   export PYTHONPATH=$(pwd)

.PHONY: test test-fast bench baseline native configs clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

bench-all:
	python benchmarks/bench_all.py

baseline:
	python benchmarks/measure_baseline.py

native:
	$(MAKE) -C native

configs:
	python examples/make_configs.py configs

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
