// Native bit-exact golden models of the fixed-point engines.
//
// This is the framework's counterpart of the reference's C/C++ model layer
// (cpp/cordic_sincos.cpp, hls/windows/win_function.cpp): an independent,
// fast implementation of every fixed-point contract, compiled to a shared
// library and driven through ctypes (model/native.py).  Tests sweep dense
// phase grids (millions of samples) against the JAX kernels — far beyond
// what the pure-Python scalar models can cover.
//
// Everything is int64 arithmetic with explicit two's-complement wraps
// (internal widths <= 48 bits; products <= 62 bits).  Semantics mirror
// model/golden.py line for line; reference citations live there.

#include <cmath>
#include <cstdint>

namespace {

// 48-bit atan LUTs (see core/luts.py; data constants of the reference).
const uint64_t LUT_ATAN_PI[48] = {
    0x400000000000ull, 0x25C80A3B3BE6ull, 0x13F670B6BDC7ull, 0x0A2223A83BBBull,
    0x05161A861CB1ull, 0x028BAFC2B209ull, 0x0145EC3CB850ull, 0x00A2F8AA23A9ull,
    0x00517CA68DA2ull, 0x0028BE5D7661ull, 0x00145F300123ull, 0x000A2F982950ull,
    0x000517CC19C0ull, 0x00028BE60D83ull, 0x000145F306D6ull, 0x0000A2F9836Dull,
    0x0000517CC1B7ull, 0x000028BE60DCull, 0x0000145F306Eull, 0x00000A2F9837ull,
    0x00000517CC1Bull, 0x0000028BE60Eull, 0x00000145F307ull, 0x000000A2F983ull,
    0x000000517CC2ull, 0x00000028BE61ull, 0x000000145F30ull, 0x0000000A2F98ull,
    0x0000000517CCull, 0x000000028BE6ull, 0x0000000145F3ull, 0x00000000A2FAull,
    0x00000000517Dull, 0x0000000028BEull, 0x00000000145Full, 0x000000000A30ull,
    0x000000000518ull, 0x00000000028Cull, 0x000000000146ull, 0x0000000000A3ull,
    0x000000000051ull, 0x000000000029ull, 0x000000000014ull, 0x00000000000Aull,
    0x000000000005ull, 0x000000000003ull, 0x000000000001ull, 0x000000000000ull};

const uint64_t LUT_ATAN_2PI[48] = {
    0x200000000000ull, 0x12E4051D9DF3ull, 0x09FB385B5EE4ull, 0x051111D41DDEull,
    0x028B0D430E59ull, 0x0145D7E15904ull, 0x00A2F61E5C28ull, 0x00517C5511D4ull,
    0x0028BE5346D1ull, 0x00145F2EBB31ull, 0x000A2F980092ull, 0x000517CC14A8ull,
    0x00028BE60CE0ull, 0x000145F306C1ull, 0x0000A2F9836Bull, 0x0000517CC1B7ull,
    0x000028BE60DCull, 0x0000145F306Eull, 0x00000A2F9837ull, 0x00000517CC1Bull,
    0x0000028BE60Eull, 0x00000145F307ull, 0x000000A2F983ull, 0x000000517CC2ull,
    0x00000028BE61ull, 0x000000145F30ull, 0x0000000A2F98ull, 0x0000000517CCull,
    0x000000028BE6ull, 0x0000000145F3ull, 0x00000000A2FAull, 0x00000000517Dull,
    0x0000000028BEull, 0x00000000145Full, 0x000000000A30ull, 0x000000000518ull,
    0x00000000028Cull, 0x000000000146ull, 0x0000000000A3ull, 0x000000000051ull,
    0x000000000029ull, 0x000000000014ull, 0x00000000000Aull, 0x000000000005ull,
    0x000000000003ull, 0x000000000001ull, 0x000000000001ull, 0x000000000000ull};

const int64_t GAIN48_HALF = 0x4DBA76D421AFll;
const int64_t GAIN48_QUARTER = 0x26DD3B6A10D8ll;

const int SEL_SIZE[25] = {15, 15, 15, 18, 21, 22, 23, 26, 30, 31, 32, 33, 38,
                          38, 38, 42, 42, 45, 47, 47, 47, 48, 48, 48, 48};

inline int64_t wrap(int64_t v, int width) {
  const int s = 64 - width;
  return (int64_t)((uint64_t)v << s) >> s;
}

// ---- HLS flavor (hls/windows/win_function.cpp:47-156) ----
void cordic_hls1(int64_t n, int pw, int w, int64_t* oc, int64_t* os) {
  const int iw = w + 2;
  int64_t lut[47];
  for (int i = 0; i < w - 1; ++i)
    lut[i] = wrap((int64_t)((LUT_ATAN_PI[i] >> (47 - w)) & 0xFFFFFFFFFFull), iw);
  const int64_t gain = GAIN48_QUARTER >> (46 - w);

  const int64_t un = n & ((1ll << pw) - 1);
  const int64_t q = un >> (pw - 2);
  const int64_t sphi = (un >> (pw - 1)) ? un - (1ll << pw) : un;
  const int64_t init_t = sphi & ~(0x3ll << (pw - 2));  // full phase width
  int64_t z = (pw - 1 < w) ? wrap(init_t << (w - pw + 2), iw)
                           : wrap((init_t >> (pw - w)) << 2, iw);
  int64_t x = gain, y = 0;
  for (int k = 0; k < w; ++k) {
    const bool neg = z < 0;
    const int64_t ys = y >> k, xs = x >> k;
    const int64_t xn = wrap(neg ? x + ys : x - ys, iw);
    const int64_t yn = wrap(neg ? y - xs : y + xs, iw);
    x = xn;
    y = yn;
    if (k < w - 1) z = wrap(neg ? z + lut[k] : z - lut[k], iw);
  }
  int64_t c = x >> 2, s = y >> 2;
  int64_t dc, ds;
  if (q == 0) {
    dc = c; ds = s;
  } else if (q == 1) {
    dc = wrap(~s + 1, iw); ds = c;
  } else if (q == 2) {
    dc = wrap(~c + 1, iw); ds = wrap(~s + 1, iw);
  } else {
    dc = s; ds = wrap(~c + 1, iw);
  }
  *oc = wrap(dc, w);
  *os = wrap(ds, w);
}

// ---- dds flavor (src/cordic_dds.vhd) ----
void cordic_dds1(int64_t n, int pw, int w, int p, int64_t* oc, int64_t* os) {
  const int iw = w + p;
  int64_t lut[47];
  for (int i = 0; i < w - 1; ++i)
    lut[i] = (int64_t)(LUT_ATAN_PI[i] >> (49 - w - p));
  const int64_t gain = GAIN48_HALF >> (49 - w - p);

  const int64_t un = n & ((1ll << pw) - 1);
  const int64_t q = un >> (pw - 2);
  const int64_t init_t = un & ((1ll << (pw - 2)) - 1);
  int64_t z = (pw >= w) ? (init_t >> (pw - w)) << p : init_t << (w - pw + p);
  int64_t x = gain, y = 0;
  for (int i = 0; i < w - 1; ++i) {
    const bool neg = z < 0;
    const int64_t ys = y >> i, xs = x >> i;
    const int64_t xn = wrap(neg ? x + ys : x - ys, iw);
    const int64_t yn = wrap(neg ? y - xs : y + xs, iw);
    x = xn;
    y = yn;
    z = wrap(neg ? z + lut[i] : z - lut[i], iw);
  }
  int64_t dc = wrap(x >> p, w), ds = wrap(y >> p, w);
  int64_t c, s;
  if (q == 0) {
    c = dc; s = ds;
  } else if (q == 1) {
    c = wrap(-ds, w); s = dc;
  } else if (q == 2) {
    c = wrap(-dc, w); s = wrap(-ds, w);
  } else {
    c = ds; s = wrap(-dc, w);
  }
  *oc = c;
  *os = s;
}

// ---- dds48 flavor (src/cordic_dds48.vhd) ----
void cordic_dds48_1(int64_t n, int pw, int w, int64_t* oc, int64_t* os) {
  const int iw = 48;
  const int64_t un = n & ((1ll << pw) - 1);
  const int64_t q = un >> (pw - 2);
  const int64_t low = un & ((1ll << (pw - 2)) - 1);
  int64_t init_t;
  if (q == 0 || q == 3)
    init_t = wrap(un, pw);
  else if (q == 1)
    init_t = low;
  else
    init_t = low - (1ll << (pw - 2));
  int64_t z = wrap(init_t << (48 - pw), iw);
  int64_t x, y;
  if (q == 0 || q == 3) {
    x = GAIN48_QUARTER; y = 0;
  } else if (q == 1) {
    x = 0; y = wrap(~GAIN48_QUARTER + 1, iw);
  } else {
    x = 0; y = GAIN48_QUARTER;
  }
  for (int i = 0; i < w; ++i) {
    const bool pos = z >= 0;
    const int64_t ys = y >> i, xs = x >> i;
    const int64_t xn = wrap(pos ? x + ys : x - ys, iw);
    const int64_t yn = wrap(pos ? y - xs : y + xs, iw);
    x = xn;
    y = yn;
    if (i < w - 1)
      z = wrap(z < 0 ? z + (int64_t)LUT_ATAN_2PI[i] : z - (int64_t)LUT_ATAN_2PI[i],
               iw);
  }
  *oc = wrap(x >> (48 - w), w);
  *os = wrap(y >> (48 - w), w);
}

// ---- scaled flavor (src/cordic_dds_scaled.vhd) ----
void cordic_scaled1(int64_t n, int pw, int w, int64_t* oc, int64_t* os) {
  const int size = SEL_SIZE[w - 8];
  const int dwph = size > pw ? size : pw;
  int64_t lut[47];
  for (int i = 0; i < w - 1; ++i)
    lut[i] = (int64_t)(LUT_ATAN_2PI[i] >> (48 - dwph));
  const int64_t gain = GAIN48_QUARTER >> (48 - size);

  const int64_t un = n & ((1ll << pw) - 1);
  const int64_t q = un >> (pw - 2);
  const int64_t low = un & ((1ll << (pw - 2)) - 1);
  int64_t init_t;
  if (q == 0 || q == 3)
    init_t = wrap(un, pw);
  else if (q == 1)
    init_t = low;
  else
    init_t = low - (1ll << (pw - 2));
  int64_t z = (size >= pw) ? wrap(init_t << (size - pw), dwph) : wrap(init_t, dwph);
  int64_t x, y;
  if (q == 0 || q == 3) {
    x = gain; y = 0;
  } else if (q == 1) {
    x = 0; y = wrap(~gain + 1, size);
  } else {
    x = 0; y = gain;
  }
  for (int i = 0; i < w; ++i) {
    const bool pos = z >= 0;
    const int64_t ys = y >> i, xs = x >> i;
    const int64_t xn = wrap(pos ? x + ys : x - ys, size);
    const int64_t yn = wrap(pos ? y - xs : y + xs, size);
    x = xn;
    y = yn;
    if (i < w - 1) z = wrap(z < 0 ? z + lut[i] : z - lut[i], dwph);
  }
  *oc = wrap(x >> (size - w), w);
  *os = wrap(y >> (size - w), w);
}

// ---- atan2 (src/cordic_atan2.vhd) ----
int64_t atan2_1(int64_t yv, int64_t xv, int iw_in, int aw, int p) {
  const int iw = aw + p;
  int64_t lut[47];
  for (int i = 0; i < aw - 1; ++i)
    lut[i] = (int64_t)(LUT_ATAN_PI[i] >> (49 - aw - p));
  const int64_t sx = (xv >> (iw_in - 1)) & 1;
  const int64_t sy = (yv >> (iw_in - 1)) & 1;
  const int64_t q = (sx << 1) | sy;
  const int64_t mask_lo = (1ll << (aw - 1)) - 1;
  int64_t x = (xv ^ (-sx)) & mask_lo;
  int64_t y = (yv ^ (-sy)) & mask_lo;
  int64_t z = 0;
  for (int i = 0; i < aw - 1; ++i) {
    const bool pos = y >= 0;
    const int64_t ys = y >> i, xs = x >> i;
    const int64_t xn = wrap(pos ? x + ys : x - ys, iw);
    const int64_t yn = wrap(pos ? y - xs : y + xs, iw);
    x = xn;
    y = yn;
    z = wrap(pos ? z - lut[i] : z + lut[i], iw);
  }
  const int64_t dat_phi = wrap(z >> p, aw);
  const int64_t phi_pi = 1ll << (aw - 2);
  int64_t out;
  if (q == 0)
    out = dat_phi;
  else if (q == 1)
    out = dat_phi + phi_pi;
  else if (q == 2)
    out = -dat_phi;
  else
    out = dat_phi - phi_pi;
  return wrap(out, aw);
}

// ---- taylor (src/taylor_sincos.vhd + src/tay1_order.vhd) ----
void taylor_rom(int ii, int ls, int w, int64_t* c, int64_t* s) {
  const double ang = ii * M_PI / (2.0 * (double)(1ll << ls));
  const double amp = std::pow(2.0, w - 1) - 1.0;
  *c = (int64_t)std::floor(amp * std::cos(ang) + 0.5);
  *s = (int64_t)std::floor(amp * std::sin(ang) + 0.5);
}

void taylor1(int64_t n, int pw, int w, int ls, int64_t* oc, int64_t* os) {
  const int64_t cnt = n & ((1ll << pw) - 1);
  const int64_t q = cnt >> (pw - 2);
  const int64_t ph = cnt & ((1ll << (pw - 2)) - 1);
  int64_t mc, ms;
  if (pw - ls < 2) {
    taylor_rom((int)(ph << (ls - pw + 2)), ls, w, &mc, &ms);
  } else if (pw - ls == 2) {
    taylor_rom((int)ph, ls, w, &mc, &ms);
  } else {
    const int stage = pw - ls - 3;
    const int addr = (int)(ph >> (pw - ls - 2));
    const int64_t acnt = ph & ((1ll << (pw - ls - 2)) - 1);
    int64_t rc, rs;
    taylor_rom(addr, ls, w, &rc, &rs);
    const int xshift = 19 + ls;
    const int64_t mpi =
        (int64_t)std::floor(M_PI * std::pow(2.0, 17 - stage) + 0.5) * acnt;
    if (w < 19) {
      mc = wrap(((rc << xshift) - mpi * rs) >> xshift, w);
      ms = wrap(((rs << xshift) + mpi * rc) >> xshift, w);
    } else {
      const int64_t bbs = wrap((mpi * rs) >> xshift, w);
      const int64_t bbc = wrap((mpi * rc) >> xshift, w);
      int64_t cp = wrap(rc - bbs, w);
      int64_t sp = wrap(rs + bbc, w);
      const int64_t clamp = (1ll << (w - 1)) - 1;
      mc = cp < 0 ? clamp : cp;
      ms = sp < 0 ? clamp : sp;
    }
  }
  if (q == 0) {
    *oc = mc; *os = ms;
  } else if (q == 1) {
    *oc = wrap(-ms, w); *os = mc;
  } else if (q == 2) {
    *oc = wrap(-mc, w); *os = wrap(-ms, w);
  } else {
    *oc = ms; *os = wrap(-mc, w);
  }
}

}  // namespace

extern "C" {

void cordic_hls_bulk(const int64_t* n, int64_t count, int pw, int w,
                     int64_t* oc, int64_t* os) {
  for (int64_t i = 0; i < count; ++i) cordic_hls1(n[i], pw, w, &oc[i], &os[i]);
}

void cordic_dds_bulk(const int64_t* n, int64_t count, int pw, int w, int p,
                     int64_t* oc, int64_t* os) {
  for (int64_t i = 0; i < count; ++i) cordic_dds1(n[i], pw, w, p, &oc[i], &os[i]);
}

void cordic_dds48_bulk(const int64_t* n, int64_t count, int pw, int w,
                       int64_t* oc, int64_t* os) {
  for (int64_t i = 0; i < count; ++i) cordic_dds48_1(n[i], pw, w, &oc[i], &os[i]);
}

void cordic_scaled_bulk(const int64_t* n, int64_t count, int pw, int w,
                        int64_t* oc, int64_t* os) {
  for (int64_t i = 0; i < count; ++i) cordic_scaled1(n[i], pw, w, &oc[i], &os[i]);
}

void atan2_bulk(const int64_t* y, const int64_t* x, int64_t count, int iw_in,
                int aw, int p, int64_t* out) {
  for (int64_t i = 0; i < count; ++i) out[i] = atan2_1(y[i], x[i], iw_in, aw, p);
}

void taylor_bulk(const int64_t* n, int64_t count, int pw, int w, int ls,
                 int64_t* oc, int64_t* os) {
  for (int64_t i = 0; i < count; ++i) taylor1(n[i], pw, w, ls, &oc[i], &os[i]);
}

// HLS-mode cosine-sum window: w[n] = a0 - m1 + m2 - ...,
// m_k = (a_k * cos_hls(k*n)) >> (W-2)  (hls/windows/win_function.cpp:361-375)
void win_hls_bulk(const int64_t* n, int64_t count, const int64_t* coeffs,
                  int nterms, int pw, int w, int64_t* out) {
  const int64_t mask = (1ll << pw) - 1;
  for (int64_t i = 0; i < count; ++i) {
    int64_t acc = coeffs[0];
    for (int k = 1; k < nterms; ++k) {
      int64_t c, s;
      cordic_hls1((k * n[i]) & mask, pw, w, &c, &s);
      const int64_t m = (coeffs[k] * c) >> (w - 2);
      acc += (k % 2 == 1) ? -m : m;
    }
    out[i] = wrap(acc, w);
  }
}

// RTL-mode cosine-sum window (the VHDL rounding contract,
// src/bh_win_3term.vhd:257-306 / src/hamming_win.vhd:183-231): cos from
// cordic_dds; product slice [2W-2:W-2] -> W+1 bits, round-half-up off
// bit 0 -> W bits; W+2-bit alternating adder tree; final round-half-up off
// bit 1.  The 2-term core subtracts in W+1 bits and rounds off bit 0.
void win_rtl_bulk(const int64_t* n, int64_t count, const int64_t* coeffs,
                  int nterms, int pw, int w, int p, int64_t* out) {
  const int64_t mask = (1ll << pw) - 1;
  for (int64_t i = 0; i < count; ++i) {
    if (nterms == 2) {
      int64_t c, s;
      cordic_dds1(n[i] & mask, pw, w, p, &c, &s);
      const int64_t r = wrap((coeffs[1] * c) >> (w - 2), w + 1);
      const int64_t b = wrap((r >> 1) + (r & 1), w);
      const int64_t pp = wrap(coeffs[0] - b, w + 1);
      out[i] = wrap((pp >> 1) + (pp & 1), w);
      continue;
    }
    int64_t acc = coeffs[0];
    for (int k = 1; k < nterms; ++k) {
      int64_t c, s;
      cordic_dds1((k * n[i]) & mask, pw, w, p, &c, &s);
      const int64_t r = wrap((coeffs[k] * c) >> (w - 2), w + 1);
      const int64_t b = wrap((r >> 1) + (r & 1), w);
      acc += (k % 2 == 1) ? -b : b;
    }
    const int64_t pp = wrap(acc, w + 2);
    out[i] = wrap((pp >> 2) + ((pp >> 1) & 1), w);
  }
}

}  // extern "C"
