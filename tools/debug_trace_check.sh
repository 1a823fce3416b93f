#!/bin/bash
# Diff the TRUST4_TPU_DEBUG=1 assembly decision trace against a reference
# -DDEBUG build (defs.h:6).  The trace replicates every printf of the
# reference's DEBUG assembler: per-read lines (main.cpp:1590), AddRead
# internals (SeqSet.hpp:3442-3937,4454), rescue (main.cpp:1904,1935),
# assignment dump (main.cpp:2122), and the ExtendSeqFromReads prints
# (SeqSet.hpp:9912-10700).  Requires byte equality.
set -e
cd "$(dirname "$0")/.."
DBG=/tmp/refdbg
if [ ! -x $DBG/trust4 ]; then
  rm -rf $DBG && cp -r /root/reference $DBG && chmod -R u+w $DBG
  sed -i 's|^//#define DEBUG|#define DEBUG|; s|^// #define DEBUG|#define DEBUG|' $DBG/defs.h
  grep -q '^#define DEBUG' $DBG/defs.h
  make -C $DBG trust4 -j4 >/dev/null 2>&1
fi
D=$(mktemp -d)
(cd $DBG && ./trust4 -f hg38_bcrtcr.fa -o $D/ref \
  -1 /root/repo/tests/data/gold_toassemble_1.fq \
  -2 /root/repo/tests/data/gold_toassemble_2.fq -t 1 \
  > $D/ref_trace.txt 2>/dev/null)
TRUST4_TPU_DEBUG=1 python - > $D/mine_trace.txt 2>/dev/null <<PYEOF
import sys; sys.path.insert(0, "$PWD")
from trust4_tpu.pipeline.assembler import Assembler
asm = Assembler("$PWD/.refbuild/hg38_bcrtcr.fa", output_prefix="$D/mine",
                threads=1)
asm.run(["$PWD/tests/data/gold_toassemble_1.fq"],
        ["$PWD/tests/data/gold_toassemble_2.fq"])
PYEOF
diff $D/ref_trace.txt $D/mine_trace.txt
echo "debug trace identical ($(wc -l < $D/ref_trace.txt) lines)"
