.PHONY: test test-fast bench lint clean cext standalone

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_ops.py tests/test_rans.py tests/test_interleaved.py -q

bench:
	python bench.py

cext:
	g++ -O3 -std=c++17 -shared -fPIC -march=native -ffp-contract=off \
		-o flashgmm_tpu/ans/_librans.so csrc/rans.cpp

# Standalone C++ codec (no Python/JAX at runtime); model cards come from
# flashgmm_tpu/standalone/export.py. See csrc/standalone/common.h.
standalone:
	mkdir -p build
	g++ -O3 -std=c++17 -ffp-contract=off -c csrc/rans.cpp -o build/rans.o
	g++ -O3 -std=c++17 -march=native \
		csrc/standalone/encoder_main.cpp build/rans.o -o build/fgsc_encode
	g++ -O3 -std=c++17 -march=native \
		csrc/standalone/decoder_main.cpp build/rans.o -o build/fgsc_decode

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -f flashgmm_tpu/ans/_librans.so
	rm -rf build
