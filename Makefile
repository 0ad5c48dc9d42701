.PHONY: test bench native suite diff clean

test:
	python -m pytest tests/ -q

native:
	python -m dask_array_tpu.native --force

bench:
	python bench.py

suite:
	python -u bench/bench_suite.py

diff:
	python bench/diff_numpy.py && python bench/diff_optimize.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; \
	rm -f dask_array_tpu/native/libplankit-*.so
