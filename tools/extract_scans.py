"""Extract AV1 default coefficient scan orders from dav1d's rodata.

Scans are permutations of 0..N-1; we identify each table's (width, height,
storage stride) by the invariant that a diagonal scan visits positions in
nondecreasing row+col order, then store them in our convention
(pos = row * min(w,32) + col) keyed by (w, h).
"""
import sys, os
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tablescan import LIBDAV1D, load_rodata_u16

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "av1tpu", "spec", "tables", "scans.npz")

D = load_rodata_u16(LIBDAV1D)['.rodata'].astype(np.int64)
tabs = {16:[64880], 32:[64752,64848], 64:[64240,64688,64784], 128:[64112,64560],
        256:[63088,63856,64304], 512:[62576,63344], 1024:[61552]}
shapes_by_area = {16:[(4,4)], 32:[(4,8),(8,4)], 64:[(8,8),(4,16),(16,4)],
                  128:[(8,16),(16,8)], 256:[(16,16),(8,32),(32,8)],
                  512:[(16,32),(32,16)], 1024:[(32,32)]}

def try_interp(vals, w, h, stride_kind):
    # stride_kind: 'row' -> pos = r*w + c ; 'col' -> pos = c*h + r
    rs, cs = [], []
    for p in vals:
        if stride_kind == 'row':
            r, c = divmod(int(p), w)
        else:
            c, r = divmod(int(p), h)
        if r >= h or c >= w:
            return None
        rs.append(r); cs.append(c)
    s = [r+c for r, c in zip(rs, cs)]
    if any(s[i+1] < s[i] for i in range(len(s)-1)):
        return None
    return list(zip(rs, cs))

out = {}
for area, offs in tabs.items():
    shapes = shapes_by_area[area]
    for o in offs:
        vals = D[o:o+area]
        matches = []
        for (w, h) in shapes:
            for sk in ('row', 'col'):
                rc = try_interp(vals, w, h, sk)
                if rc is not None:
                    matches.append((w, h, sk, rc))
        # dedup: square row/col both valid only if symmetric; prefer unique shape
        shapes_found = {(m[0], m[1]) for m in matches}
        if len(shapes_found) != 1:
            print(f'area{area}@{o}: ambiguous {shapes_found}')
            # for squares both interps may differ; pick... report both
        for (w, h, sk, rc) in matches:
            key = f'{w}x{h}'
            arr = np.array([r*w + c for r, c in rc], np.int32)
            if key in out and not np.array_equal(out[key], arr):
                print(f'conflict for {key} (stride {sk})')
                out[key + '_alt'] = arr
            else:
                out[key] = arr
        print(f'area{area}@{o}: shapes {sorted(shapes_found)}')
np.savez(OUT, **out)
print('saved:', sorted(out.keys()))
