#!/usr/bin/env bash
# Build + install the av1tpu daemon as a systemd service.
#
# Executable counterpart of DEPLOY.md, replacing the reference's
# scripts/deploy.sh (reference deploy.sh:1-324: apt deps, cargo build,
# binary install, systemd unit).  Idempotent; re-run to upgrade.
#
# Usage: sudo deploy/deploy.sh [--prefix /opt/av1tpu] [--no-systemd]
set -euo pipefail

PREFIX=/opt/av1tpu
SYSTEMD=1
while [ $# -gt 0 ]; do
  case "$1" in
    --prefix) PREFIX=$2; shift 2 ;;
    --no-systemd) SYSTEMD=0; shift ;;
    *) echo "unknown argument: $1" >&2; exit 2 ;;
  esac
done

REPO=$(cd "$(dirname "$0")/.." && pwd)

echo "== checking build dependencies"
for tool in cmake ninja python3; do
  command -v "$tool" >/dev/null || { echo "missing: $tool" >&2; exit 1; }
done
python3 -c "import jax" 2>/dev/null \
  || echo "warning: jax not importable — the TPU encode plane needs it"

echo "== building native components"
cmake -S "$REPO/native" -B "$REPO/native/build" -G Ninja
cmake --build "$REPO/native/build"
"$REPO/native/build/av1d_selftest" >/dev/null && echo "selftest: ok"

echo "== installing to $PREFIX"
mkdir -p "$PREFIX"
# the Python package is imported in place; native binaries ride along
rsync -a --delete \
  --exclude '.git' --exclude 'tests' --exclude 'benchmarks' \
  --exclude 'native/build/CMakeFiles' \
  "$REPO/av1tpu" "$REPO/native" "$REPO/deploy" "$PREFIX/"
install -m 755 "$REPO/native/build/av1tpu-daemon" /usr/local/bin/av1tpu-daemon
install -m 755 "$REPO/native/build/av1tpu-top" /usr/local/bin/av1tpu-top
install -m 755 "$REPO/native/build/av1_tool" /usr/local/bin/av1_tool

echo "== configuration"
mkdir -p /etc/av1tpu /var/lib/av1-daemon/jobs /var/lib/av1-daemon/temp
if [ ! -f /etc/av1tpu/config.toml ]; then
  cat > /etc/av1tpu/config.toml <<EOF
# av1tpu daemon configuration (see $PREFIX/deploy/DEPLOY.md)
[scan]
library_roots = []            # add media roots, e.g. ["/media/library"]
scan_interval_secs = 60
stability_wait_secs = 10

[paths]
job_state_dir = "/var/lib/av1-daemon/jobs"
temp_output_dir = "/var/lib/av1-daemon/temp"

[gates]
min_bytes = 1048576
max_size_ratio = 0.95

[tpu]
qindex = 72
encode_timeout_secs = 21600
# encode_cmd = "python3 -m av1tpu.cli encode -i {input} -o {output} --qindex {qindex} --workers {workers}"
EOF
  echo "wrote /etc/av1tpu/config.toml (edit library_roots before starting)"
fi

if [ "$SYSTEMD" = 1 ]; then
  echo "== installing systemd unit"
  sed "s|@PREFIX@|$PREFIX|g" "$REPO/deploy/av1tpu-daemon.service" \
    > /etc/systemd/system/av1tpu-daemon.service 2>/dev/null \
    || cp "$REPO/deploy/av1tpu-daemon.service" \
         /etc/systemd/system/av1tpu-daemon.service
  systemctl daemon-reload
  echo "enable with: systemctl enable --now av1tpu-daemon"
fi

echo "== done"
