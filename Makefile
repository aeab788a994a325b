# Developer targets for fun-asr-vllm-tpu.

PYTHON ?= python

.PHONY: test test-fast native wheel bench bench-quick loc clean

test:                ## full suite on the virtual 8-device CPU mesh
	$(PYTHON) -m pytest tests/ -q

test-fast:           ## fast tier: conformance/numerics core, <8 min
	$(PYTHON) -m pytest tests/ -q -m "not slow"

native:              ## build the C++ runtime kernels
	$(MAKE) -C csrc

wheel:               ## build a wheel into dist/
	$(PYTHON) -m pip wheel . --no-deps --no-build-isolation -w dist/

bench:               ## full flagship benchmark on the attached TPU
	$(PYTHON) bench.py

bench-quick:         ## tiny-model smoke bench
	$(PYTHON) bench.py --quick

loc:                 ## reproducible non-test source line count
	@echo "package py:"; find fun_asr_vllm_tpu -name '*.py' | xargs wc -l | tail -1
	@echo "csrc:"; find csrc -name '*.cpp' -o -name '*.h' | xargs wc -l | tail -1
	@echo "tools+bench+entry py:"; wc -l tools/*.py bench.py __graft_entry__.py | tail -1
	@echo "tests py:"; find tests -name '*.py' | xargs wc -l | tail -1

clean:
	rm -rf dist/ build/ *.egg-info csrc/build/
