import glob, sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sorted(glob.glob('/tmp/jtrace/plugins/profile/*/vm.xplane.pb'))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, 'rb').read())
for plane in xs.planes:
    if 'TPU' not in plane.name:
        continue
    ev_names = {i: m.name for i, m in plane.event_metadata.items()}
    tot = defaultdict(float); cnt = defaultdict(int)
    for line in plane.lines:
        for ev in line.events:
            n = ev_names.get(ev.metadata_id, '?')
            tot[n] += ev.duration_ps / 1e9
            cnt[n] += 1
    print(f"== plane {plane.name}")
    for n, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{ms:10.2f} ms  x{cnt[n]:6d}  {n[:95]}")
