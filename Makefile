# Build/test/bench entry points (role of the reference's Makefile:
# /root/reference/Makefile — cargo/cbindgen/CMake orchestration; here the
# native piece is the C++ host runtime and everything else is Python/JAX).

PY ?= python
CXX ?= g++
CXXFLAGS ?= -O3 -march=native -std=c++17 -shared -fPIC -pthread

NATIVE_SRC := infera_tpu/runtime/src/infera_host.cpp
NATIVE_LIB := infera_tpu/runtime/_build/libinfera_host.so

.PHONY: all native test test-fast bench clean lint gate

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	mkdir -p $(dir $(NATIVE_LIB))
	$(CXX) $(CXXFLAGS) $(NATIVE_SRC) -o $(NATIVE_LIB)

test: native
	$(PY) -m pytest tests/ -q

test-fast: native
	$(PY) -m pytest tests/ -q -x

bench: native
	$(PY) bench.py

gate:
	JAX_PLATFORMS=cpu $(PY) tools/static_gate.py

clean:
	rm -rf infera_tpu/runtime/_build
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
