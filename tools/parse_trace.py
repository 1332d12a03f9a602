"""Exclusive per-op timing from the last trace, grouped by op name prefix."""
import glob, sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sorted(glob.glob('/tmp/jtrace/plugins/profile/*/*.xplane.pb'))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, 'rb').read())
for plane in xs.planes:
    if 'TPU' not in plane.name:
        continue
    ev_names = {i: m.name for i, m in plane.event_metadata.items()}
    print(f"== plane {plane.name}")
    for line in plane.lines:
        evs = sorted(line.events, key=lambda e: e.offset_ps)
        if not evs: continue
        total = sum(e.duration_ps for e in evs) / 1e9
        if total < 1.0: continue
        print(f"-- line {line.name}: total {total:.2f} ms, {len(evs)} events")
        tot = defaultdict(float); cnt = defaultdict(int)
        for ev in evs:
            n = ev_names.get(ev.metadata_id, '?')
            tot[n] += ev.duration_ps / 1e9
            cnt[n] += 1
        for n, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {ms:9.3f} ms x{cnt[n]:5d}  {n[:110]}")
