# Per-round CI surface. `make replicates` regenerates all four
# full-registry correctness artifacts at HEAD (VERDICT r3 item 10:
# one target so no round can skip a replicate); `make all` is the
# complete pre-commit gate.
#
# Each replicate is a separate JVM on purpose — the hostile runs
# prove queries hold under session configs the repo didn't build.

PY := python

.PHONY: all test replicates verify verify-sf01 verify-driver \
        verify-hostile bench stress audit empty probes

all: replicates test audit empty bench

test:
	$(PY) -m pytest tests/ -x -q

# --- the four full-registry correctness replicates -------------------
replicates: verify verify-sf01 verify-driver verify-hostile

verify:
	$(PY) scripts/verify_contract.py

verify-sf01:
	$(PY) scripts/verify_contract.py --sf-dir /root/testdata/sf0.1 \
	    --json-out /root/repo/CORRECTNESS_local_sf01.json

verify-driver:
	$(PY) scripts/verify_driver_session.py

verify-hostile:
	SPARK_GRAFT_HOSTILE_PLANNER=1 $(PY) scripts/verify_driver_session.py \
	    --json-out /root/repo/CORRECTNESS_hostile_planner.json

# --- performance and plan gates --------------------------------------
bench:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $(PY) bench.py 2>/dev/null | tail -1

stress:
	$(PY) scripts/scale_stress.py

audit:
	$(PY) scripts/explain_audit.py

empty:
	$(PY) scripts/edge_empty.py

probes:
	$(PY) scripts/probe_avro.py
	$(PY) scripts/probe_acid.py
