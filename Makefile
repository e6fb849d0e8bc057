# Convenience targets (see CLAUDE.md for environment quirks)

.PHONY: test bench benchmarks native clean check-tpu serve-largen-smoke

# on-chip parity gate for every shipped Pallas kernel vs its XLA oracle
# (interpret-mode CI cannot catch Mosaic lowering bugs) — run before any
# BENCH/RESULTS submission
check-tpu:
	python tools/check_tpu.py

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# full reference-config benchmark sweep → RESULTS.json (TPU, slow compiles)
benchmarks:
	python run_benchmarks.py

scaling:
	python bench_scaling.py

native:
	$(MAKE) -C csrc

clean:
	$(MAKE) -C csrc clean
	rm -rf .pytest_cache

# pre-compile every benchmark program into the persistent cache so axon's
# 3-20 min remote compiles are paid once, not per experiment run
warm:
	python tools/warm_cache.py

# slow-tier smoke (TPU, ~30-60 min cold): the REAL serve CLI round-trip
# at N = 65536 through the matrix-free path — fit, amortized state,
# 256-point predict, raw-unit CSV — wallclock + relres evidence recorded
# in tools/serve_largen_smoke.json (VERDICT r4 #7).  Never share the chip.
serve-largen-smoke:
	python tools/serve_largen_smoke.py 65536 20
