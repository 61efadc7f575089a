# Developer entry points (reference has a Makefile + run wrapper;
# reference: Makefile:1-15, run:1-11)

.PHONY: test test-fast bench lint native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
	    audio_analysis_tpu/native/ccl.cpp -o audio_analysis_tpu/native/_ccl.so

lint:
	python -m black --check audio_analysis_tpu tests tools bench.py

clean:
	rm -f audio_analysis_tpu/native/_ccl.so
	find . -name __pycache__ -type d -exec rm -rf {} +
