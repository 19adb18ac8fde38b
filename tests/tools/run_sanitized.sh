#!/bin/bash
# Run the concurrency-heavy native test slice under AddressSanitizer /
# ThreadSanitizer builds of the native runtime (the analog of the
# reference's valgrind/ASAN CI infrastructure; reference: CMakeLists
# GRK_USE_ASAN + tests/CTestConfig).
#
#   tests/tools/run_sanitized.sh asan   # heap/UB checking (default)
#   tests/tools/run_sanitized.sh tsan   # data-race checking
#
# Notes:
# - ASan must be loaded before python: LD_PRELOAD of libasan plus
#   ASAN_OPTIONS=detect_leaks=0 (CPython itself "leaks" interned
#   objects at exit, which is noise here).
# - TSan + libgomp reports races inside the OpenMP runtime's own
#   barrier implementation unless libgomp was built with TSan; we
#   suppress those and keep user-code races fatal.
set -euo pipefail
cd "$(dirname "$0")/../.."

MODE="${1:-asan}"
NATDIR=grokimagecompression_tpu/native
make -s -C "$NATDIR" "$MODE"

# Native-heavy slice. Mesh/shard_map tests stay out: an LD_PRELOADed
# libasan aborts inside jaxlib's own (uninstrumented) MLIR lowering,
# which is noise for checking OUR runtime.
TESTS=(tests/test_t1_native.py tests/test_ht.py tests/test_codec.py
       tests/test_ht_refinement.py tests/test_pcrd.py
       tests/test_window_decode.py)
KARGS=(-k "not mesh and not sharded")

if [ "$MODE" = asan ]; then
    LIBASAN=$(gcc -print-file-name=libasan.so)
    env GROK_T1_LIB=libgrok_t1_asan.so \
        LD_PRELOAD="$LIBASAN" \
        ASAN_OPTIONS=detect_leaks=0:abort_on_error=1 \
        python -m pytest "${TESTS[@]}" "${KARGS[@]}" -q -x
else
    LIBTSAN=$(gcc -print-file-name=libtsan.so)
    SUPP=$(mktemp)
    cat > "$SUPP" <<'EOF'
race:^gomp_
race:libgomp
# glibc's TLS block reuse between dying and starting Python threads is
# not annotated for TSan (thread_local scratch destructor vs
# _dl_deallocate_tls); well-known false-positive family.
race:_dl_deallocate_tls
race:PyThread_start_new_thread
race:__call_tls_dtors
EOF
    # -k 'not grok': interop tests spawn the REFERENCE binaries, which
    # inherit the libtsan preload — and TSan then reports data races in
    # the reference codec itself (verified 2026-08-18: all 12 reports
    # were inside grk_compress/grk_decompress; zero in our runtime).
    # GROK_TPU_THREADS=1: libgomp is not TSan-instrumented, so TSan
    # cannot see its barriers and flags every intra-team access as a
    # race (GCC's documented limitation). nt=1 disables the OpenMP
    # teams entirely (the pragmas carry `if (nt > 1)`), while the REAL
    # sharing surface — concurrent Python threads calling into the
    # runtime (tile pool, batch workers) — stays multi-threaded and
    # fully checked.
    # Remaining reports after the suppressions are thread-STACK-reuse
    # false positives: glibc recycles an exited pool thread's stack for
    # the main thread, TSan loses the exit happens-before ("failed to
    # restore the stack") and flags main-vs-dead-thread accesses at
    # 0x7ffe.. stack addresses. A REAL race in our runtime would show
    # libgrok frames on BOTH sides of a report — gate on that instead.
    LOGS=$(mktemp -d)/tsan
    env GROK_T1_LIB=libgrok_t1_tsan.so \
        LD_PRELOAD="$LIBTSAN" GROK_TPU_THREADS=1 \
        TSAN_OPTIONS="suppressions=$SUPP log_path=$LOGS exitcode=0" \
        python -m pytest "${TESTS[@]}" -q -x -k 'not grok and not mesh and not sharded'
    python - "$LOGS" <<'EOF'
import glob, re, sys
bad = 0
for f in glob.glob(sys.argv[1] + "*"):
    for rep in open(f).read().split("WARNING: ThreadSanitizer")[1:]:
        sides = rep.split("Previous ")
        if len(sides) >= 2 and all("libgrok_t1" in s for s in sides[:2]):
            bad += 1
            print("REAL race candidate:\n" + rep[:1200])
if bad:
    sys.exit(66)
print("tsan: no two-sided races in the native runtime")
EOF
fi
echo "sanitized ($MODE) run: OK"
