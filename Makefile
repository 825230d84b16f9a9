.PHONY: test test-fast bench lint clean cext

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_ops.py tests/test_rans.py tests/test_interleaved.py -q

bench:
	python bench.py

cext:
	g++ -O3 -std=c++17 -shared -fPIC -march=native \
		-o flashgmm_tpu/ans/_librans.so csrc/rans.cpp

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -f flashgmm_tpu/ans/_librans.so
