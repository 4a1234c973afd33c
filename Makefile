# gifgan_tpu developer workflow (the reference's Makefile had
# bootstrap/lint/clean; this adds test/native/bench).

PYTHON ?= python

.PHONY: test lint native bench clean

test:
	$(PYTHON) -m pytest tests/ -x -q

lint:
	$(PYTHON) -m flake8 gifgan_tpu/ tests/ --max-line-length=100 || true

native:
	$(MAKE) -C native

bench:
	$(PYTHON) bench.py

clean:
	rm -rf .pytest_cache
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
