#!/bin/bash
# Sanitizer-instrumented fuzz campaign over the native untrusted-input
# decoders (VERDICT round-4 weak #5: the -O3 campaign cannot see
# out-of-bounds reads that don't segfault).
#
#   bash tools/fuzz_asan.sh [--iters N] [targets...]
#
# Defaults: jls jxl dicom at 2000 mutations per seed blob (>= 10k total:
# jls/jxl have 2 seed blobs each, dicom has 10 across the five transfer
# syntaxes). The committed clean-campaign record lives at
# docs/artifacts/fuzz_asan_r5.json.
#
# Mechanics (each line load-bearing):
#  * CODEC_TCC_ASAN=1 makes the ctypes bindings build/load the
#    -fsanitize=address,undefined -fno-sanitize-recover=all variants and
#    tells fuzz_codecs.py to skip its RLIMIT_AS cap (ASan's shadow memory
#    reserves ~20 TB of address space).
#  * LD_PRELOAD of the gcc libasan runtime: a sanitized .so cannot be
#    dlopen'd into an uninstrumented interpreter otherwise ("ASan runtime
#    does not come first").
#  * detect_leaks=0: CPython intentionally leaks interned objects at exit;
#    leak reports would drown real findings. abort_on_error=1 turns any
#    finding into a crash the harness sees as rc != 0.
#  * The axon TPU plugin gate is stripped and JAX pinned to cpu — the
#    package import chain initializes jax, and a fuzz run must never touch
#    the chip (CLAUDE.md: never run two TPU processes concurrently).
set -u
cd "$(dirname "$0")/.."

ITERS=2000
TARGETS=()
while [ $# -gt 0 ]; do
  case "$1" in
    --iters) ITERS="$2"; shift 2 ;;
    *) TARGETS+=("$1"); shift ;;
  esac
done
[ ${#TARGETS[@]} -eq 0 ] && TARGETS=(jls jxl dicom)

LIBASAN="$(g++ -print-file-name=libasan.so)"
if [ ! -e "$LIBASAN" ]; then
  echo '{"error": "libasan.so not found (gcc sanitizer runtime missing)"}'
  exit 2
fi

# append, never replace, PYTHONPATH (CLAUDE.md: the axon site dir must stay)
env -u PALLAS_AXON_POOL_IPS \
  PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}" \
  JAX_PLATFORMS=cpu \
  CODEC_TCC_ASAN=1 \
  LD_PRELOAD="$LIBASAN" \
  ASAN_OPTIONS=detect_leaks=0,abort_on_error=1 \
  UBSAN_OPTIONS=halt_on_error=1,print_stacktrace=1 \
  python tools/fuzz_codecs.py "${TARGETS[@]}" --iters "$ITERS"
