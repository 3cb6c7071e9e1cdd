# Developer entrypoints (mirrors the reference's Makefile-driven CI:
# /root/reference/Makefile:60-76 and .github/workflows/test.yml:12-60).
# `make ci` = lint + type-check + tests (incl. doctests) from a fresh checkout.

PYTHON ?= python

.PHONY: test doctest lint ci bench multichip

test:
	$(PYTHON) -m pytest tests/ -q

doctest:
	$(PYTHON) -m pytest tests/test_doctests.py -q

# ruff/mypy when the environment has them; otherwise the in-repo stdlib
# AST linter (tools/lint.py) enforcing the same core rule set.
lint:
	@if $(PYTHON) -c "import ruff" 2>/dev/null; then \
		$(PYTHON) -m ruff check rectools_tpu tests benchmarks; \
	else \
		$(PYTHON) tools/lint.py rectools_tpu; \
	fi
	@if $(PYTHON) -c "import mypy" 2>/dev/null; then \
		$(PYTHON) -m mypy rectools_tpu; \
	else \
		$(PYTHON) tools/sigcheck.py rectools_tpu tests benchmarks; \
	fi

ci: lint test

bench:
	$(PYTHON) bench.py

multichip:
	JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
		$(PYTHON) -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip dryrun ok')"
