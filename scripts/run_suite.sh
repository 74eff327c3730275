#!/usr/bin/env bash
# Full-suite runner that survives the XLA-CPU-compile segfault
# (CLAUDE.md "Environment gotchas"; VERDICT r4 weak #5: two consecutive
# full-suite runs hit exit 139 at ~95% while every file passes alone).
#
# Strategy: run the test files in SEPARATE interpreter invocations, a few
# files per process (BATCH, default 4, amortizes the ~10 s jax import).
# A segfault kills one batch process, not the run; any batch that dies on
# a signal (exit >= 128) or fails is re-run file-by-file, so a flaky
# compile crash only costs a retry while a real failure is still reported.
# Exits non-zero iff some file fails (or crashes) even in isolation.
#
# Usage: scripts/run_suite.sh [BATCH]   (from the repo root)

set -u
cd "$(dirname "$0")/.."
BATCH="${1:-4}"
FILES=(tests/test_*.py)
TOTAL_PASS=0
FAILED_FILES=()
RETRIED_FILES=()

run_pytest() {  # args: files...
    python -m pytest "$@" -q --no-header -p no:cacheprovider 2>&1
    return $?
}

count_passed() {  # parse "N passed" from pytest tail output
    echo "$1" | grep -oE '[0-9]+ passed' | tail -1 | grep -oE '[0-9]+' || echo 0
}

echo "# run_suite: ${#FILES[@]} files, batches of $BATCH"
i=0
while [ $i -lt ${#FILES[@]} ]; do
    group=("${FILES[@]:$i:$BATCH}")
    i=$((i + BATCH))
    out=$(run_pytest "${group[@]}")
    rc=$?
    if [ $rc -eq 0 ]; then
        n=$(count_passed "$out")
        TOTAL_PASS=$((TOTAL_PASS + n))
        echo "ok   [batch] ${group[*]} ($n passed)"
        continue
    fi
    # batch failed or crashed: isolate per file
    if [ $rc -ge 128 ]; then
        echo "sig  [batch rc=$rc] ${group[*]} — re-running per file"
    else
        echo "FAIL [batch rc=$rc] ${group[*]} — re-running per file"
    fi
    for f in "${group[@]}"; do
        fout=$(run_pytest "$f")
        frc=$?
        if [ $frc -eq 0 ]; then
            n=$(count_passed "$fout")
            TOTAL_PASS=$((TOTAL_PASS + n))
            RETRIED_FILES+=("$f")
            echo "ok   [isolated] $f ($n passed)"
        elif [ $frc -ge 128 ]; then
            # crashed even alone: one more try (compile flake is sporadic)
            f2out=$(run_pytest "$f")
            if [ $? -eq 0 ]; then
                n=$(count_passed "$f2out")
                TOTAL_PASS=$((TOTAL_PASS + n))
                RETRIED_FILES+=("$f")
                echo "ok   [isolated, 2nd try] $f ($n passed)"
            else
                FAILED_FILES+=("$f")
                echo "FAIL [crashes in isolation rc=$frc] $f"
                echo "$f2out" | tail -15
            fi
        else
            FAILED_FILES+=("$f")
            echo "FAIL [rc=$frc] $f"
            echo "$fout" | tail -25
        fi
    done
done

echo "# ----------------------------------------------------------------"
echo "# run_suite: $TOTAL_PASS tests passed across ${#FILES[@]} files"
if [ ${#RETRIED_FILES[@]} -gt 0 ]; then
    echo "# isolated-retry (batch segfault/fail, green alone): ${RETRIED_FILES[*]}"
fi
if [ ${#FAILED_FILES[@]} -gt 0 ]; then
    echo "# FAILED: ${FAILED_FILES[*]}"
    exit 1
fi
echo "# all green"
exit 0
