#!/bin/bash
# AddressSanitizer run over the whole native runtime (mirrors the reference's
# `make asan=1`, /root/reference/Makefile:8-12): builds the four libraries
# with -fsanitize=address into native/asan/, then drives the real pipeline
# (example e2e + randomized differential corpora) against them.  Any ASan
# report aborts with a nonzero exit.
#
# Usage: bash tools/asan_check.sh [fuzz_lo fuzz_hi]
set -e
cd "$(dirname "$0")/.."
NAT=trust4_tpu/native
mkdir -p $NAT/asan
# (make asan=1 builds in place and would clobber the fast libraries, so
# build explicitly into asan/ with the same flags.)
CXXFLAGS="-O1 -g -fsanitize=address -march=x86-64-v3 -fPIC -shared -std=c++17"
g++ $CXXFLAGS -o $NAT/asan/libt4align.so $NAT/align_kernels.cpp
g++ $CXXFLAGS -pthread -o $NAT/asan/libt4extract.so $NAT/extract_filter.cpp -lz
g++ $CXXFLAGS -pthread -o $NAT/asan/libt4overlap.so $NAT/overlap_engine.cpp \
  -L$NAT/asan -lt4align -Wl,-rpath,'$ORIGIN'
g++ $CXXFLAGS -pthread -o $NAT/asan/libt4bam.so $NAT/bam_scan.cpp \
  $NAT/extract_filter.cpp -lz
echo "asan libraries built"

LIBASAN=$(g++ -print-file-name=libasan.so)
export LD_PRELOAD=$LIBASAN
# Python itself is not asan-instrumented: disable leak checking (CPython
# "leaks" by design at exit) and keep ODR checks off for ctypes dlopens.
export ASAN_OPTIONS=detect_leaks=0:abort_on_error=1:detect_odr_violation=0
export TRUST4_TPU_NATIVE_DIR=$PWD/$NAT/asan
# The device pass is irrelevant for the native-memory check; forcing CPU
# keeps jax's own allocations out of the report.
export JAX_PLATFORMS=cpu

D=$(mktemp -d)
python -m trust4_tpu.cli run \
  -1 .refbuild/example/example_1.fq -2 .refbuild/example/example_2.fq \
  -f .refbuild/hg38_bcrtcr.fa --ref .refbuild/human_IMGT+C.fa \
  -o $D/asan -t 4 >/dev/null
cmp $D/asan_final.out tests/data/gold_final.out
cmp $D/asan_cdr3.out tests/data/gold_cdr3.out
echo "example e2e: asan-clean, outputs identical"

LO=${1:-7000}; HI=${2:-7006}
python tools/fuzz_differential.py $LO $HI
# Barcoded corpora exercise the per-barcode counter pass, barcode release,
# and the barcoded branches of the native assembly loop.
python tools/fuzz_differential_barcoded.py $LO $HI
echo "asan check passed"
