#!/bin/bash
# On-hardware pytest of every TPU-gated test, one process per file with a
# retry (the axon claim handshake occasionally wedges a fresh process
# forever; see CLAUDE.md).  The full suite is NOT run on the TPU backend on
# purpose: interpret-mode Pallas tests dispatch per-element through the
# tunnel and hang there — they are covered by the committed CPU-suite run
# (tests/conftest.py forces the CPU backend by default).
# Usage: bash benchmarks/tpu_test_runner.sh /tmp/r5_tpu_pytest.log
set -u
LOG="${1:-/tmp/tpu_gated_pytest.log}"
: > "$LOG"
run_one() {
    local target="$1"
    for attempt in 1 2 3; do
        echo "=== $target (attempt $attempt) ===" >> "$LOG"
        timeout 1200 env GLABC_TPU_TESTS=1 python -u -m pytest "$target" -q \
            >> "$LOG" 2>&1
        local rc=$?
        echo "--- exit $rc ---" >> "$LOG"
        if [ $rc -eq 0 ]; then return 0; fi
        # 124 = timeout (wedged claim or hung tunnel): retry fresh
        if [ $rc -ne 124 ]; then return $rc; fi
        sleep 10
    done
    return 124
}
FAIL=0
run_one "tests/test_fused_kernel.py" || FAIL=1
run_one "tests/test_flow_kernel.py::TestFlowKernelHardware" || FAIL=1
run_one "tests/test_aglmcmc_fused.py::TestTPUParity" || FAIL=1
run_one "tests/test_aglmcmc_mixed.py::TestTPUParity" || FAIL=1
run_one "tests/test_aglmcmc_mixed.py::TestTPUTileProgramParity" || FAIL=1
run_one "tests/test_generic_glmala.py::test_ma2_posterior_matches_scan_glmala" || FAIL=1
echo "OVERALL: $([ $FAIL -eq 0 ] && echo ALL PASSED || echo FAILURES)" >> "$LOG"
exit $FAIL
