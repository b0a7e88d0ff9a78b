#!/usr/bin/env bash
# Build webx.zip for spark-submit --py-files (the reference's package.sh
# analog). Usage: scripts/package.sh [outdir]  ->  <outdir>/webx.zip
set -euo pipefail
repo="$(cd "$(dirname "$0")/.." && pwd)"
outdir="${1:-/tmp}"
out="$outdir/webx.zip"
rm -f "$out"
(cd "$repo" && zip -q -r "$out" webx -i 'webx/*.py' 'webx/_ctok.c')
echo "$out"
