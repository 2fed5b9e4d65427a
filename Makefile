# Developer entry points (reference CI analogs: unit-test-llmruntime /
# cpp-graph-test perf+accuracy gates).

PY ?= python

.PHONY: test gate gate-perf bench

test:
	$(PY) -m pytest tests/ -x -q

# accuracy gate: quantized-vs-fp32 PPL ratios on the fixed synthetic
# corpus, against baselines/accuracy.json (fails on >10% drift)
gate:
	$(PY) scripts/gate.py

# + perf gate vs the committed TPU latency baseline (real chip only)
gate-perf:
	$(PY) scripts/gate.py --perf

bench:
	$(PY) bench.py

# BASELINE.md config 2-4 perf gate vs the committed baseline (real chip)
gate-configs:
	$(PY) scripts/bench_configs.py --gate baselines/configs_tpu.json
