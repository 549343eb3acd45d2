/* Native host kernels for crypto3_zk_tpu.
 *
 * The role of the reference's native host code paths (SURVEY.md §2.0: the
 * transcript byte hashes are sequential host work): Keccak-f[1600] with the
 * ORIGINAL 0x01 padding (crypto3's keccak_1600<256>), plus a batched leaf
 * API for byte-hash Merkle trees. Built as a shared library and loaded via
 * ctypes (no pybind11 in the image).
 */
#include <stdint.h>
#include <string.h>

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int ROT[5][5] = {{0, 36, 3, 41, 18},
                              {1, 44, 10, 45, 2},
                              {62, 6, 43, 15, 61},
                              {28, 55, 25, 21, 56},
                              {27, 20, 39, 8, 14}};

#define ROTL(x, n) (((x) << (n)) | ((x) >> (64 - (n))))

static void keccak_f(uint64_t st[25]) {
    uint64_t a[5][5], b[5][5], c[5], d[5];
    int x, y, r;
    for (x = 0; x < 5; ++x)
        for (y = 0; y < 5; ++y)
            a[x][y] = st[x + 5 * y];
    for (r = 0; r < 24; ++r) {
        for (x = 0; x < 5; ++x)
            c[x] = a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4];
        for (x = 0; x < 5; ++x)
            d[x] = c[(x + 4) % 5] ^ ROTL(c[(x + 1) % 5], 1);
        for (x = 0; x < 5; ++x)
            for (y = 0; y < 5; ++y)
                a[x][y] ^= d[x];
        for (x = 0; x < 5; ++x)
            for (y = 0; y < 5; ++y)
                b[y][(2 * x + 3 * y) % 5] =
                    ROT[x][y] ? ROTL(a[x][y], ROT[x][y]) : a[x][y];
        for (x = 0; x < 5; ++x)
            for (y = 0; y < 5; ++y)
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y]);
        a[0][0] ^= RC[r];
    }
    for (x = 0; x < 5; ++x)
        for (y = 0; y < 5; ++y)
            st[x + 5 * y] = a[x][y];
}

/* Original Keccak-256: rate 136, pad 0x01..0x80. */
void zk_keccak_256(const uint8_t *data, uint64_t len, uint8_t out[32]) {
    uint64_t st[25];
    uint8_t block[136];
    uint64_t off = 0;
    int i;
    memset(st, 0, sizeof(st));
    while (len - off >= 136) {
        for (i = 0; i < 17; ++i) {
            uint64_t w;
            memcpy(&w, data + off + 8 * i, 8);
            st[i] ^= w;
        }
        keccak_f(st);
        off += 136;
    }
    memset(block, 0, sizeof(block));
    memcpy(block, data + off, len - off);
    block[len - off] = 0x01;
    block[135] ^= 0x80;
    for (i = 0; i < 17; ++i) {
        uint64_t w;
        memcpy(&w, block + 8 * i, 8);
        st[i] ^= w;
    }
    keccak_f(st);
    memcpy(out, st, 32);
}

/* Batched fixed-size-message hashing (byte-hash Merkle leaf/levels). */
void zk_keccak_256_batch(const uint8_t *data, uint64_t msg_len,
                         uint64_t count, uint8_t *out /* count*32 */) {
    uint64_t i;
    for (i = 0; i < count; ++i)
        zk_keccak_256(data + i * msg_len, msg_len, out + i * 32);
}
