#!/bin/bash
# Install smoke test — counterpart of the reference's
# tests/test_installation.sh: one assemble run over the shipped fixtures,
# compared against the expected path string.
set -euo pipefail

cd "$(dirname "$0")/.."
workdir=$(mktemp -d)
trap 'rm -rf "$workdir"' EXIT

cp /root/reference/tests/ref.fa /root/reference/tests/scaf.f-f.fa "$workdir"/
(cd "$workdir" && PYTHONPATH="$OLDPWD" python3 -m ntjoin_tpu.cli assemble -B \
    backend=numpy target=scaf.f-f.fa target_weight=1 references='ref.fa' \
    reference_weights='2' prefix=smoke k=32 w=1000 n=2 overlap=False)

expected=$'ntJoin0\t1_f+:0-1981 20N 2_f+:0-2329'
got=$(grep '^ntJoin' "$workdir/smoke.path")
if [[ "$got" == "$expected" ]]; then
    echo "Installation test PASSED"
else
    echo "Installation test FAILED: got '$got'" >&2
    exit 1
fi
