.PHONY: test gate audit bench all

test:
	python -m pytest tests/ -q

gate:
	python tools/oracle_check.py

audit:
	python tools/plan_audit.py

bench:
	python bench.py

all: test gate audit bench
