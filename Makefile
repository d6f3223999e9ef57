# Native components + dev workflow.

CXX ?= g++
CXXFLAGS ?= -O3 -march=native -std=c++17 -shared -fPIC

NATIVE_DIR := sqe_tpu/native
SOS := $(NATIVE_DIR)/libhnsw_builder.so $(NATIVE_DIR)/libtext_prep.so

.PHONY: all native test bench clean

all: native

native: $(SOS)

$(NATIVE_DIR)/lib%.so: $(NATIVE_DIR)/%.cc
	$(CXX) $(CXXFLAGS) $< -o $@

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -f $(SO)
	find . -name __pycache__ -type d -exec rm -rf {} +
