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

# Full suite split into two roughly-equal halves run in parallel (the full
# serial suite is ~9 min on this host; the halves fit a 10-min CI window).
HALF_A = tests/test_engine.py tests/test_engine_walking.py \
         tests/test_engine_mujoco.py tests/test_golden.py \
         tests/test_srbd_loop.py
test-par:
	@$(PY) -m pytest $(HALF_A) -q -m "not xslow" > /tmp/pytest_half_a.log 2>&1 & \
	pid=$$!; \
	$(PY) -m pytest tests/ -q -m "not xslow" $(foreach f,$(HALF_A),--ignore=$(f)); rc=$$?; \
	wait $$pid; rc2=$$?; \
	echo "--- half A ---"; tail -3 /tmp/pytest_half_a.log; \
	exit $$(( rc + rc2 ))

bench:
	$(PY) bench.py

# Flagship walk at float32 (8 steps + settle on the walking invariants);
# runs on the TPU under the ambient platform, `make verify-f32 F32=cpu`
# forces the CPU f32 control run. ~10 min cold. 220 periods: the TPU f32
# draw takes a different chaotic path than CPU f32 and ends the walk with a
# larger settle transient (pitch -0.23 rad at t=7.2 s); both converge
# exponentially and pass the full bar by 8.8 s (round-4 measurement,
# tools/diag_f32_settle.py; on-chip record in docs/BENCHMARKS.md).
verify-f32:
	$(PY) tools/verify_walk_f32.py $(F32) n_periods=220

# MuJoCo walking robustness ensemble (mid-walk pushes; see the tool docstring).
ensemble-mj:
	$(PY) tools/ensemble_mjwalk.py 6 4 width=0.16 ds=0.35 tgain=0 dcm=1.0 gztol=0.06 lock=1.0

clean:
	rm -f native/libqp_solver.so
	find . -name __pycache__ -type d -exec rm -rf {} +
