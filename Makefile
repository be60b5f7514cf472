# Developer convenience targets
.PHONY: all native test bench lint smoke clean

all: native test

native:
	$(MAKE) -C native

test: native
	python3 -m pytest tests/ -q

bench: native
	python3 bench.py

smoke: native
	bash scripts/test_installation.sh

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache __pycache__ ntjoin_tpu/__pycache__
