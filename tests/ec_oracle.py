"""Python-int short-Weierstrass oracle for EC tests (affine, textbook)."""


def ec_neg(p, mod):
    return None if p is None else (p[0], (-p[1]) % mod)


def ec_add(p, q, a, mod):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2 and (y1 + y2) % mod == 0:
        return None
    if p == q:
        lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, mod) % mod
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, mod) % mod
    x3 = (lam * lam - x1 - x2) % mod
    y3 = (lam * (x1 - x3) - y1) % mod
    return (x3, y3)


def ec_mul(p, k, a, mod):
    if k < 0:
        return ec_mul(ec_neg(p, mod), -k, a, mod)
    acc = None
    for bit in bin(k)[2:] if k else "":
        acc = ec_add(acc, acc, a, mod)
        if bit == "1":
            acc = ec_add(acc, p, a, mod)
    return acc


def ec_msm_oracle(pts, scalars, a, mod):
    """Σ k_i·P_i as affine int pair (or None for identity)."""
    acc = None
    for p, k in zip(pts, scalars):
        acc = ec_add(acc, ec_mul(p, k, a, mod), a, mod)
    return acc


# --- generic-field short-Weierstrass oracle (host tower elements) ---

def ec_add_f(F, p, q, a):
    """Affine add over any host field ops F (zkarray.ff.tower_host)."""
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if F.eq(x1, x2) and F.eq(F.add(y1, y2), F.zero()):
        return None
    if F.eq(x1, x2) and F.eq(y1, y2):
        num = F.add(F.mul(F.embed(3), F.mul(x1, x1)), a)
        lam = F.mul(num, F.inv(F.add(y1, y1)))
    else:
        lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
    x3 = F.sub(F.sub(F.mul(lam, lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    return (x3, y3)


def ec_mul_f(F, p, k, a):
    acc = None
    for bit in bin(k)[2:] if k else "":
        acc = ec_add_f(F, acc, acc, a)
        if bit == "1":
            acc = ec_add_f(F, acc, p, a)
    return acc
