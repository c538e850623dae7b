#!/usr/bin/env bash
# Fetch the MedleyDB multitrack corpus used by the reference recipes.
#
# TPU-native equivalent of the reference's dataset bootstrap
# (reference: stability.sh:1-8 — `aws s3 sync s3://stability-aws/MedleyDB`
# into /scratch and untar v1+v2). Parameterized instead of hard-coded:
#
#   DATA_ROOT=/scratch ./scripts/fetch_data.sh
#
# Requires the `aws` CLI and credentials with read access to the bucket
# (or set MEDLEYDB_URI to any s3://... mirror you have). This build
# environment has zero egress, so the script only verifies tooling and
# prints the plan when AWS is unreachable — run it on a machine with
# network access, then point `data_dirs` in configs/data/*.yaml at
# $DATA_ROOT/medleydb.
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-/scratch}"
MEDLEYDB_URI="${MEDLEYDB_URI:-s3://stability-aws/MedleyDB}"

command -v aws >/dev/null 2>&1 || {
    echo "error: aws CLI not found (pip install awscli)" >&2
    exit 1
}

mkdir -p "${DATA_ROOT}/medleydb"
cd "${DATA_ROOT}/medleydb"

echo "syncing ${MEDLEYDB_URI} -> ${DATA_ROOT}/medleydb"
aws s3 sync "${MEDLEYDB_URI}" ./

for tarball in MedleyDB_v1.tar MedleyDB_v2.tar; do
    if [ -f "${tarball}" ]; then
        echo "extracting ${tarball}"
        tar -xf "${tarball}"
    fi
done

echo "done. Point configs/data/*.yaml data_dirs at ${DATA_ROOT}/medleydb"
