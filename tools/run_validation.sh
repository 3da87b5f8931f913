#!/bin/bash
# Full local validation: oracle gate at sf0.01 + full pytest suite.
set -u
cd "$(dirname "$0")/.."
{
  python tools/check_oracles.py /root/testdata/sf0.01 2>&1 | tr '\r' '\n' | grep -E "^(OK|FAIL|rows|[0-9]+ failures)"
  echo "===PYTEST==="
  python -m pytest tests/ -q 2>&1 | tail -1
} > /tmp/final_validation.log 2>&1
tail -3 /tmp/final_validation.log
