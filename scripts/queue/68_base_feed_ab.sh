#!/bin/bash
# Box-downsample baseline feed A/B (PANODEPTH_BASE_FEED=box): reads the
# streamed uint8 panorama once via a reshape-mean instead of the full-res
# f32 bilinear feed.  Throughput via the b24 stage split, both feeds.
cd /root/repo
rc=0
timeout 1800 python scripts/e2e_profile.py 24 \
    > /tmp/q/out/feed_bilinear.json 2>&1 || rc=1
tail -1 /tmp/q/out/feed_bilinear.json
PANODEPTH_BASE_FEED=box timeout 1800 python scripts/e2e_profile.py 24 \
    > /tmp/q/out/feed_box.json 2>&1 || rc=1
tail -1 /tmp/q/out/feed_box.json
exit $rc
