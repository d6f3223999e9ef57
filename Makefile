# Native components + dev workflow.

CXX ?= g++
CXXFLAGS ?= -O3 -march=native -std=c++17 -shared -fPIC

NATIVE_DIR := sqe_tpu/native
SO := $(NATIVE_DIR)/libhnsw_builder.so

.PHONY: all native test bench clean

all: native

native: $(SO)

$(SO): $(NATIVE_DIR)/hnsw_builder.cc
	$(CXX) $(CXXFLAGS) $< -o $@

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -f $(SO)
	find . -name __pycache__ -type d -exec rm -rf {} +
