# Developer targets for fun-asr-vllm-tpu.

PYTHON ?= python

.PHONY: test test-fast native wheel bench bench-quick clean

test:                ## full suite on the virtual 8-device CPU mesh
	$(PYTHON) -m pytest tests/ -q

test-fast:           ## CPU-cheap subset (no encoder/engine compiles)
	$(PYTHON) -m pytest tests/test_text.py tests/test_data_factory.py \
		tests/test_harness.py tests/test_native.py tests/test_serialization.py -q

native:              ## build the C++ runtime kernels
	$(MAKE) -C csrc

wheel:               ## build a wheel into dist/
	$(PYTHON) -m pip wheel . --no-deps --no-build-isolation -w dist/

bench:               ## full flagship benchmark on the attached TPU
	$(PYTHON) bench.py

bench-quick:         ## tiny-model smoke bench
	$(PYTHON) bench.py --quick

clean:
	rm -rf dist/ build/ *.egg-info csrc/build/
