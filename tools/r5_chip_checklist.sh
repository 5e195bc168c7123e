#!/bin/bash
# Round-5 post-quality-run chip measurement sequence (single-client
# tunnel: run ONLY after the 30k quality run has exited).
# Each step appends to /tmp/r5_chip/: probe_loop, bench A/B,
# trace, viewer fps. Run steps individually or the whole file.
set -x
mkdir -p /tmp/r5_chip
cd /root/repo

# 1. Real-loop steady-state percentiles at 1008px (VERDICT r4 item 3)
timeout 2400 python -u tools/probe_loop.py --out /tmp/probe_r5 \
    --image_size 1008 --iterations 300 2>&1 | tee /tmp/r5_chip/probe_loop.log

# 2. Driver bench baseline + A/B flags (items 4/5, speed side)
timeout 1800 python -u bench.py 2>&1 | tee /tmp/r5_chip/bench_default.log
timeout 1800 python -u bench.py --alpha_cull 2>&1 | tee /tmp/r5_chip/bench_alphacull.log
timeout 1800 python -u bench.py --pack_features 2>&1 | tee /tmp/r5_chip/bench_pack.log

# 3. Device trace for the roofline doc (item 4b)
timeout 1800 python -u tools/trace_steps.py --out /tmp/trase_trace 2>&1 | tee /tmp/r5_chip/trace.log
python tools/trace_steps.py --summarize /tmp/trase_trace --top 30 2>&1 | tee /tmp/r5_chip/trace_summary.log

# 4. Viewer FPS at the reference GUI's 800x800 default (item 6)
printf 'render\nrender\nrender\nrender\nrender\nrender\nrender\nrender\nfps\nquit\n' > /tmp/r5_chip/viewer_script.txt
timeout 1200 python -u viewer.py -m /tmp/scale_30k_r5/model --is_blender \
    --script /tmp/r5_chip/viewer_script.txt --out /tmp/r5_chip/viewer_frames \
    2>&1 | tee /tmp/r5_chip/viewer_fps.log

# 5. pack_features quality A/B: two short same-seed 1008px runs (item 5)
timeout 3600 python -u tools/validate_scale.py --out /tmp/ab_off \
    --iterations 1500 --feature_warmup_frac 0.4 --target_alive 0 \
    --densify_until_frac 0.1 --seed 3 2>&1 | tee /tmp/r5_chip/ab_off.log
timeout 3600 python -u tools/validate_scale.py --out /tmp/ab_on \
    --iterations 1500 --feature_warmup_frac 0.4 --target_alive 0 \
    --densify_until_frac 0.1 --seed 3 --pack_features 2>&1 | tee /tmp/r5_chip/ab_on.log
