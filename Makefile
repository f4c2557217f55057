# Build/test driver — the analogue of the reference's catkin Makefile
# (SURVEY.md §2.1 row 12), minus ROS: native lib + tests + bench.

PY ?= python

.PHONY: all native test test-fast bench clean

all: native test

native:
	g++ -O3 -march=native -shared -fPIC -o native/libqp_solver.so native/qp_solver.cpp

test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

clean:
	rm -f native/libqp_solver.so
	find . -name __pycache__ -type d -exec rm -rf {} +
