# nann_tpu development entry points.

# Local work must escape the axon remote-TPU env (see docs/DESIGN.md).
LOCAL_ENV = env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
            XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test native bench bench-quick pipeline multihost clean

native:
	$(MAKE) -C native

test: native
	$(LOCAL_ENV) python -m pytest tests/ -x -q

bench:            ## real-TPU benchmark (slow first compile; caches persist)
	python bench.py --sweep

bench-quick:
	$(LOCAL_ENV) python bench.py --quick

pipeline:         ## tiny end-to-end pipeline on CPU
	$(LOCAL_ENV) python -m nann_tpu.main --job-type all --synthetic \
	  --num-item 3000 --num-users 300 --batch-size 64 --num-neg 20 \
	  --max-steps 150 --top-k-per-level 200 100 50 --topk-eval 100 \
	  --num-test-batch 48 --output-root output/

multihost:
	$(LOCAL_ENV) python scripts/multihost_sim.py --hosts 2

clean:
	$(MAKE) -C native clean
	rm -rf output/ .pytest_cache/
