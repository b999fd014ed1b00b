# Developer entry points (parity: reference Makefile docker targets are
# replaced by native build + test + bench targets).

.PHONY: native test bench clean

native:
	$(MAKE) -C chiron_tpu/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	$(MAKE) -C chiron_tpu/native clean
