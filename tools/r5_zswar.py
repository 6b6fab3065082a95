"""Numpy validation of the SWAR transposes for the z64 Pallas tape kernel.

Stage 1 (bit 8x8): 8 bit-plane u32 words w_b (bit j of byte-lane q = bit b
of key 8q+j's byte) -> 8 words t_j (byte-lane q = full byte of key 8q+j).
Stage 2 (byte 4x4): 4 per-byte-position words A_i (byte-lane q = byte of
key 8q+j at stream-byte-position i) -> 4 words O_q (u32 LE value
B0|B1<<8|B2<<16|B3<<24 of key 8q+j).
"""
import numpy as np

rng = np.random.RandomState(0)
U = np.uint32


def transpose_bits_8x8(w):
    """w: list of 8 u32 arrays; returns t: list of 8 u32 arrays with
    t[j] bit (8q+b) = w[b] bit (8q+j)."""
    w = [x.copy() for x in w]
    # delta 4
    m = U(0x0F0F0F0F)
    for b in range(4):
        x, y = w[b], w[b + 4]
        w[b] = (x & m) | ((y & m) << U(4))
        w[b + 4] = ((x >> U(4)) & m) | (y & ~m)
    # delta 2
    m = U(0x33333333)
    for b in (0, 1, 4, 5):
        x, y = w[b], w[b + 2]
        w[b] = (x & m) | ((y & m) << U(2))
        w[b + 2] = ((x >> U(2)) & m) | (y & ~m)
    # delta 1
    m = U(0x55555555)
    for b in (0, 2, 4, 6):
        x, y = w[b], w[b + 1]
        w[b] = (x & m) | ((y & m) << U(1))
        w[b + 1] = ((x >> U(1)) & m) | (y & ~m)
    return w


def transpose_bytes_4x4(a):
    """a: list of 4 u32; returns o: list of 4 u32 with
    o[q] byte i = a[i] byte q."""
    a = [x.copy() for x in a]
    m = U(0x0000FFFF)
    b0 = (a[0] & m) | ((a[2] & m) << U(16))
    b2 = ((a[0] >> U(16)) & m) | (a[2] & ~m)
    b1 = (a[1] & m) | ((a[3] & m) << U(16))
    b3 = ((a[1] >> U(16)) & m) | (a[3] & ~m)
    m = U(0x00FF00FF)
    o0 = (b0 & m) | ((b1 & m) << U(8))
    o1 = ((b0 >> U(8)) & m) | (b1 & ~m)
    o2 = (b2 & m) | ((b3 & m) << U(8))
    o3 = ((b2 >> U(8)) & m) | (b3 & ~m)
    return [o0, o1, o2, o3]


def check_bits():
    # build ground truth: 32 keys, each with a random byte; plane b = bits b
    keybytes = rng.randint(0, 256, 32).astype(np.uint8)
    w = []
    for b in range(8):
        word = U(0)
        for k in range(32):
            word |= U(((keybytes[k] >> b) & 1)) << U(k)
        w.append(np.array([word], U))
    t = transpose_bits_8x8(w)
    ok = True
    mapping = {}
    for j in range(8):
        for q in range(4):
            got = (int(t[j][0]) >> (8 * q)) & 0xFF
            # find which key's byte this is
            ks = [k for k in range(32) if keybytes[k] == got]
            mapping[(j, q)] = got
            want = keybytes[8 * q + j]
            if got != want:
                ok = False
                print(f"bits: t[{j}] byte {q}: got {got:02x} want {want:02x} "
                      f"(candidates {ks})")
    print("bit transpose exact (t[j] byte q = key 8q+j):", ok)
    return ok


def check_bytes():
    ab = rng.randint(0, 256, (4, 4)).astype(np.uint8)  # [i][q]
    a = []
    for i in range(4):
        word = U(0)
        for q in range(4):
            word |= U(int(ab[i][q])) << U(8 * q)
        a.append(np.array([word], U))
    o = transpose_bytes_4x4(a)
    ok = True
    for q in range(4):
        for i in range(4):
            got = (int(o[q][0]) >> (8 * i)) & 0xFF
            want = int(ab[i][q])
            if got != want:
                ok = False
                print(f"bytes: o[{q}] byte {i}: got {got:02x} want {want:02x}")
    print("byte transpose exact (o[q] byte i = a[i] byte q):", ok)
    return ok


if __name__ == "__main__":
    ok = check_bits() & check_bytes()
    print("ALL OK" if ok else "FAIL")
