# Convenience targets (see README.md / CLAUDE.md)

.PHONY: test test-fast bench bench-suite smoke native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_tasks.py \
	  --ignore=tests/test_pallas_mcconv.py --ignore=tests/test_dense_conv.py

bench:
	python bench.py

bench-suite:
	python bench_suite.py

smoke:
	python -m mccnn_tpu.tasks.modelnet --synthetic --epochs 2 --batch 8 \
	  --points 256 --grow 16 --steps-per-epoch 4

native:
	g++ -O3 -shared -fPIC -o mccnn_tpu/native/libmccnn_native.so \
	  mccnn_tpu/native/fastparse.cpp

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -f mccnn_tpu/native/libmccnn_native.so
