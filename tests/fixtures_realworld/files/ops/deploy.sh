#!/usr/bin/env bash
set -euo pipefail

source lib/colors.sh
. ./env.sh

BUILD_DIR="${BUILD_DIR:-dist}"

log_step() {
  echo "[deploy] $1"
}

function build_assets {
  log_step "building into ${BUILD_DIR}"
  npm run build -- --out "${BUILD_DIR}"
}

function upload() {
  log_step "uploading"
  rsync -a "${BUILD_DIR}/" deploy@host:/srv/app/
}

# wave-8b shape: heredoc body is string DATA — its function-shaped
# line must not mint a declaration
usage() {
  cat <<USAGE
usage: deploy.sh [target]
ghost() { never a function }
USAGE
}

main() {
  build_assets
  upload
}

main "$@"
