# Convenience targets for the grokimagecompression_tpu framework.

.PHONY: test tpu-test native bench

# Host suite (forces CPU; ~7-8 min with a warm .jax_cache)
test:
	python -m pytest tests/ -x -q

# Real-accelerator kernel slice: runs the Pallas/device tests that the
# host suite skips (tests/conftest.py forces CPU unless GROK_TPU_TESTS=1)
# and records the log so the run is auditable (VERDICT r4 weak #8).
tpu-test:
	GROK_TPU_TESTS=1 python -m pytest \
	    tests/test_mq_dec_pallas.py tests/test_ht_dec_pallas.py \
	    tests/test_dwt_pallas.py tests/test_fused_encode.py \
	    tests/test_device_decode.py \
	    -q 2>&1 | tee tpu_test_log.txt

native:
	$(MAKE) -C grokimagecompression_tpu/native

bench:
	python bench.py
