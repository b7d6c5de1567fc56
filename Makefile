# One-command gates, mirroring the reference Makefile (reference:
# Makefile:1-21 — run_release / fmt / clippy / test / ci).

.PHONY: run fmt lint test test-full bench ci native

run:
	python -m raytracer2022_tpu.cli --scene wwscene --width 640 --height 360 --spp 100 --out output/output.jpg

fmt:
	ruff format raytracer2022_tpu tests tools bench.py __graft_entry__.py

# local images may lack ruff; degrade to a syntax gate (CI always runs ruff)
lint:
	@if python -c "import ruff" 2>/dev/null; then \
		python -m ruff check raytracer2022_tpu tests tools bench.py __graft_entry__.py; \
	else \
		python -m compileall -q raytracer2022_tpu tests tools bench.py __graft_entry__.py && echo "compileall ok (ruff unavailable)"; \
	fi

test:
	JAX_PLATFORMS=cpu python -m pytest tests/ -q

# the full battery including @slow statistical cross-checks (nightly gate)
test-full:
	JAX_PLATFORMS=cpu python -m pytest tests/ -q -m ""

bench:
	python bench.py

native:
	$(MAKE) -C native

# the reference's `make ci` = fmt-check + clippy + test + release run
ci: lint test
	@echo CI gate passed
