#!/bin/bash
# Build the reference validation harness OUTSIDE the repo (in /tmp).
# The harness links the unmodified reference C++ core (read-only mount) and
# is used only to generate agreement fixtures; see compare_vs_reference.py.
set -e
mkdir -p /tmp/ref_harness
cp "$(dirname "$0")/ref_harness.cpp" /tmp/ref_harness/harness.cpp
g++ -O2 -std=c++11 -I/root/reference/src /tmp/ref_harness/harness.cpp \
    /root/reference/src/context.cpp /root/reference/src/cca.cpp \
    /root/reference/src/lsc.cpp /root/reference/src/timer.cpp \
    /root/reference/src/parallel.cpp -o /tmp/ref_harness/harness
echo built: /tmp/ref_harness/harness
