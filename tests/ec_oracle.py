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
