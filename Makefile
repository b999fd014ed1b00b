# Developer entry points (parity: reference Makefile docker targets are
# replaced by native build + test + bench targets).

.PHONY: native test bench clean docker

native:
	$(MAKE) -C chiron_tpu/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

docker:
	docker build -t chiron_tpu .

clean:
	$(MAKE) -C chiron_tpu/native clean
