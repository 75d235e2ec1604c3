# Development harness (reference analog: Makefile:20-23 — test + lint gate).

PY ?= python

.PHONY: test lint bench check

test:
	$(PY) -m pytest tests/ -x -q

lint:
	$(PY) tools/lint.py

bench:
	$(PY) bench.py

check: lint test
