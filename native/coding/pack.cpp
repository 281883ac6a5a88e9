/*
 * pack.cpp — production AV1 tile packer for the TPU encode pipeline.
 *
 * Serializes the fixed-grid decisions produced by the TPU pipeline
 * (16x16 luma / 8x8 chroma blocks, V_PRED, DCT/ADST_DCT, quantized level
 * grids) into a conformant AV1 intra tile, byte-identical to the Python spec
 * engine (av1tpu/spec/tile.py) which is validated bit-exactly against dav1d
 * and libaom.
 *
 * Range coder: daala-style with the canonical terminator; the "low"
 * accumulator tracks the stream-space lower bound (od_ec low convention)
 * with 16-bit pre-carry cells.
 *
 * v1 scope: luma dimensions multiples of 64 (the Python driver pads and
 * signals the true size via render_size), single tile, 8-bit.
 */

#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>

#include <vector>

#include "tables_gen.h"

namespace {

constexpr int PROB_TOP = 1 << 15;
constexpr int EC_PROB_SHIFT = 6;
constexpr int EC_MIN_PROB = 4;

/* ------------------------------------------------------------------ */
/* range encoder                                                       */
/* ------------------------------------------------------------------ */

struct Ec {
    std::vector<uint32_t> cells;  // 16-bit pre-carry cells
    uint64_t low = 0;             // stream-space lower bound (window)
    int local_bits = 15;          // bits currently represented in `low`
    unsigned rng = PROB_TOP;
    long nbits = 15;

    void flush_cell() {
        // move the top 16 bits of the window into a cell
        int sh = local_bits - 16;
        cells.push_back((uint32_t)(low >> sh));
        low &= ((uint64_t)1 << sh) - 1;
        local_bits -= 16;
    }

    void carry_fix() {
        // `low` may have overflowed local_bits after an add
        if (low >> local_bits) {
            low &= ((uint64_t)1 << local_bits) - 1;
            // propagate +1 into cells
            for (int i = (int)cells.size() - 1; i >= 0; i--) {
                cells[i]++;
                if (cells[i] <= 0xFFFF) break;
                cells[i] = 0;
            }
        }
    }

    static unsigned cut(unsigned rng, int f, int remaining) {
        return (((rng >> 8) * (unsigned)(f >> EC_PROB_SHIFT))
                >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * remaining;
    }

    void encode(int s, const int32_t *icdf, int n) {
        unsigned r = rng;
        unsigned v = cut(r, icdf[s], n - 1 - s);
        unsigned u = s > 0 ? cut(r, icdf[s - 1], n - s) : r;
        low += r - u;  // stream-space low accumulates the top offset
        carry_fix();
        rng = u - v;
        // renorm: shift rng back into [2^15, 2^16)
        int sh = __builtin_clz(rng) - 16;
        if (sh > 0) {
            rng <<= sh;
            low <<= sh;
            local_bits += sh;
            nbits += sh;
            while (local_bits >= 48) flush_cell();
        }
    }

    void encode_bool_equi(int b) {
        static const int32_t half[2] = {16384, 0};
        encode(b, half, 2);
    }

    size_t done(uint8_t *out, size_t cap) {
        // canonical daala terminator: round low up to the next odd multiple
        // of 2^14 and emit everything above the low 14 bits
        uint64_t m = (1 << 14) - 1;
        uint64_t e = ((low + m) & ~m) | (m + 1);
        if (e >> local_bits) {
            e &= ((uint64_t)1 << local_bits) - 1;
            for (int i = (int)cells.size() - 1; i >= 0; i--) {
                cells[i]++;
                if (cells[i] <= 0xFFFF) break;
                cells[i] = 0;
            }
        }
        long total_bits = nbits - 14;
        long cell_bits = (long)cells.size() * 16;
        long tail_bits = total_bits - cell_bits;  // bits to take from e
        // assemble bitstream (cells are 16-bit aligned at bit offset 0)
        size_t nbytes = (size_t)((total_bits + 7) / 8);
        if (nbytes < 1) nbytes = 1;
        if (nbytes > cap) return 0;
        uint8_t *p = out;
        for (uint32_t c : cells) {
            *p++ = (uint8_t)(c >> 8);
            *p++ = (uint8_t)c;
        }
        // top tail_bits of e (e has local_bits significant bits), msb first
        uint64_t tail = e >> (local_bits - tail_bits);
        long tb = tail_bits;
        while (tb >= 8) {
            tb -= 8;
            *p++ = (uint8_t)(tail >> tb);
        }
        if (tb > 0) *p++ = (uint8_t)(tail << (8 - tb));
        return nbytes;
    }
};

/* ------------------------------------------------------------------ */
/* adaptive cdfs                                                       */
/* ------------------------------------------------------------------ */

struct Cdf {
    int32_t v[17];
    int n;    // number of symbols
    int count = 0;

    void init(const int32_t *src, int width) {
        n = 0;
        for (int i = 0; i < width; i++) {
            v[i] = src[i];
            if (src[i] == 0) { n = i + 1; break; }
        }
    }

    void update(int sym) {
        static const int floorlog2[17] = {0, 0, 1, 1, 2, 2, 2, 2, 3, 3,
                                          3, 3, 3, 3, 3, 3, 4};
        int rate = 3 + (count > 15) + (count > 31) +
                   (floorlog2[n] < 2 ? floorlog2[n] : 2);
        int tmp = PROB_TOP;
        for (int i = 0; i < n - 1; i++) {
            if (i == sym) tmp = 0;
            if (tmp < v[i]) v[i] -= (v[i] - tmp) >> rate;
            else v[i] += (tmp - v[i]) >> rate;
        }
        count += count < 32;
    }
};

struct Coder {
    Ec ec;
    bool update = true;
    void sym(Cdf &c, int s) {
        static FILE *trace_fp =
            getenv("AV1PACK_TRACE") ? fopen(getenv("AV1PACK_TRACE"), "a")
                                    : nullptr;
        if (trace_fp) { fprintf(trace_fp, "%d %d\n", c.n, s); fflush(trace_fp); }
        ec.encode(s, c.v, c.n);
        if (update) c.update(s);
    }
    void literal(int v, int bits) {
        for (int i = bits - 1; i >= 0; i--) ec.encode_bool_equi((v >> i) & 1);
    }
};

/* ------------------------------------------------------------------ */
/* tile state                                                          */
/* ------------------------------------------------------------------ */

struct Tile {
    Coder co;
    int qctx;
    int mi_rows, mi_cols;
    // cdfs
    Cdf partition[20];
    Cdf kf_y[5][5];
    Cdf uv_mode[2][13];
    Cdf angle_delta[8];
    Cdf ext_tx2[4][13];
    Cdf ext_tx1[4][13];     // intra tx set 1 (4x4/8x8 sub-tx), 7 symbols
    Cdf tx_size_c[4][3];    // tx depth per category (TX_MODE_SELECT)
    Cdf skip[3];
    Cdf txb_skip[5][13];
    Cdf eob_pt256[2][2], eob_pt64[2][2], eob_pt1024[2][2], eob_pt16[2][2];
    Cdf eob_extra[5][2][9];
    Cdf base_eob[5][2][4];
    Cdf base[5][2][42];
    Cdf br[4][2][21];
    Cdf dc_sign[2][3];
    // contexts
    std::vector<int32_t> above_part, left_part;
    std::vector<int8_t> above_skip, left_skip;   // per block (16px)
    std::vector<int8_t> above_mode, left_mode;   // ctx-mapped y mode
    std::vector<int32_t> a_lvl[3], l_lvl[3], a_dc[3], l_dc[3];  // 4-px units
    std::vector<int32_t> above_txw, left_txh;    // per mi, tx dims (SELECT)
    int tx_select = 0;  // frame header tx_mode == TX_MODE_SELECT

    void init(int q, int rows, int cols) {
        mi_rows = rows;
        mi_cols = cols;
        qctx = q <= 20 ? 0 : q <= 60 ? 1 : q <= 120 ? 2 : 3;
        // 8x8 contexts (0..3) are 4-symbol cdfs (NONE/H/V/SPLIT only)
        for (int i = 0; i < 20; i++)
            partition[i].init(&tab_partition[i][0], i < 4 ? 4 : 10);
        for (int i = 0; i < 5; i++)
            for (int j = 0; j < 5; j++) kf_y[i][j].init(&tab_kf_y_mode[i][j][0], 13);
        for (int i = 0; i < 2; i++)
            for (int j = 0; j < 13; j++) uv_mode[i][j].init(&tab_uv_mode[i][j][0], 14);
        for (int i = 0; i < 8; i++) angle_delta[i].init(&tab_angle_delta[i][0], 7);
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 13; j++) ext_tx2[i][j].init(&tab_intra_ext_tx_2[i][j][0], 5);
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 13; j++) ext_tx1[i][j].init(&tab_intra_ext_tx_1[i][j][0], 7);
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 3; j++)
                tx_size_c[i][j].init(&tab_tx_size[i][j][0], i == 0 ? 2 : 3);
        for (int i = 0; i < 3; i++) skip[i].init(&tab_skip[i][0], 2);
        for (int t = 0; t < 5; t++)
            for (int c2 = 0; c2 < 13; c2++) txb_skip[t][c2].init(&tab_txb_skip[qctx][t][c2][0], 2);
        for (int p = 0; p < 2; p++)
            for (int c2 = 0; c2 < 2; c2++) {
                eob_pt256[p][c2].init(&tab_eob_pt_256[qctx][p][c2][0], 9);
                eob_pt64[p][c2].init(&tab_eob_pt_64[qctx][p][c2][0], 7);
                eob_pt1024[p][c2].init(&tab_eob_pt_1024[qctx][p][c2][0], 11);
                eob_pt16[p][c2].init(&tab_eob_pt_16[qctx][p][c2][0], 5);
            }
        for (int t = 0; t < 5; t++)
            for (int p = 0; p < 2; p++) {
                for (int c2 = 0; c2 < 9; c2++) eob_extra[t][p][c2].init(&tab_eob_extra[qctx][t][p][c2][0], 2);
                for (int c2 = 0; c2 < 4; c2++) base_eob[t][p][c2].init(&tab_coeff_base_eob[qctx][t][p][c2][0], 3);
                for (int c2 = 0; c2 < 42; c2++) base[t][p][c2].init(&tab_coeff_base[qctx][t][p][c2][0], 4);
            }
        for (int t = 0; t < 4; t++)
            for (int p = 0; p < 2; p++)
                for (int c2 = 0; c2 < 21; c2++) br[t][p][c2].init(&tab_coeff_br[qctx][t][p][c2][0], 4);
        for (int p = 0; p < 2; p++)
            for (int c2 = 0; c2 < 3; c2++) dc_sign[p][c2].init(&tab_dc_sign[qctx][p][c2][0], 2);

        above_part.assign(mi_cols, 0);
        left_part.assign(mi_rows, 0);
        // mi-granular mode/skip neighbor context (blocks are 16 or 32 px)
        above_skip.assign(mi_cols, 0);
        left_skip.assign(mi_rows, 0);
        above_mode.assign(mi_cols, 0);
        left_mode.assign(mi_rows, 0);
        above_txw.assign(mi_cols, 64);
        left_txh.assign(mi_rows, 64);
        for (int p2 = 0; p2 < 3; p2++) {
            a_lvl[p2].assign(mi_cols + 8, 0);
            l_lvl[p2].assign(mi_rows + 8, 0);
            a_dc[p2].assign(mi_cols + 8, 0);
            l_dc[p2].assign(mi_rows + 8, 0);
        }
    }

    // inter-frame tables + per-mi neighbor state (pack_tile_inter)
    Cdf intra_inter_c[4];
    Cdf single_ref_c[3][6];
    Cdf newmv_c[6], zeromv_c[2], refmv_c[6], drl_c[3];
    Cdf mv_joints_c, mv_sign_c[2], mv_classes_c[2], mv_class0_c[2];
    Cdf mv_class0_fp_c[2][2], mv_fp_c[2], mv_bits_c[2][10];
    Cdf inter_tx3_c[4];
    std::vector<int32_t> mi_mv_r, mi_mv_c;   // per mi unit, 1/8-pel
    std::vector<int8_t> mi_newmv;            // per mi unit
    std::vector<int8_t> mi_coded;            // per mi unit (inter coded)
    std::vector<int8_t> mi_n4;               // per mi unit: block mi width
    // intra luma tx_type from the prediction mode (spec Mode_To_Txfm):
    // the wavefront keyframe pipeline codes each mode's residual with its
    // derived transform (av1tpu/models/intra_wave.py); the V-family
    // pipelines stay DCT-only (flag 0)
    int tx_from_mode = 0;
    std::vector<int8_t> mi_ref;              // per mi unit: 1=LAST 4=GOLDEN
    // optional per-16-block reference grid (0=LAST, 1=GOLDEN); null means
    // the single-ref LAST chain (av1tpu/spec/tile.py _code_single_ref)
    const int16_t *ref_grid = nullptr;

    void init_inter() {
        for (int i = 0; i < 4; i++)
            intra_inter_c[i].init(&tab_intra_inter[i][0], 2);
        for (int i = 0; i < 3; i++)
            for (int j = 0; j < 6; j++)
                single_ref_c[i][j].init(&tab_single_ref[i][j][0], 2);
        for (int i = 0; i < 6; i++) newmv_c[i].init(&tab_newmv[i][0], 2);
        for (int i = 0; i < 2; i++) zeromv_c[i].init(&tab_zeromv[i][0], 2);
        for (int i = 0; i < 6; i++) refmv_c[i].init(&tab_refmv[i][0], 2);
        for (int i = 0; i < 3; i++) drl_c[i].init(&tab_drl[i][0], 2);
        mv_joints_c.init(&tab_mv_joints[0], 4);
        for (int comp = 0; comp < 2; comp++) {
            mv_sign_c[comp].init(&tab_mv_sign[0], 2);
            mv_classes_c[comp].init(&tab_mv_classes[0], 11);
            mv_class0_c[comp].init(&tab_mv_class0[0], 2);
            for (int b = 0; b < 2; b++)
                mv_class0_fp_c[comp][b].init(&tab_mv_class0_fp[b][0], 4);
            mv_fp_c[comp].init(&tab_mv_fp[0], 4);
            for (int i = 0; i < 10; i++)
                mv_bits_c[comp][i].init(&tab_mv_bits[i][0], 2);
        }
        for (int i = 0; i < 4; i++)
            inter_tx3_c[i].init(&tab_inter_tx3[i][0], 2);
        mi_mv_r.assign((size_t)mi_rows * mi_cols, 0);
        mi_mv_c.assign((size_t)mi_rows * mi_cols, 0);
        mi_newmv.assign((size_t)mi_rows * mi_cols, 0);
        mi_coded.assign((size_t)mi_rows * mi_cols, 0);
        mi_n4.assign((size_t)mi_rows * mi_cols, 4);
        mi_ref.assign((size_t)mi_rows * mi_cols, 1);
    }

    int part_ctx(int r, int c, int bsl) {
        int above = r > 0 ? (above_part[c] >> bsl) & 1 : 0;
        int left = c > 0 ? (left_part[r] >> bsl) & 1 : 0;
        return left * 2 + above;
    }

    void update_part_ctx(int r, int c, int mi_w, int mi_h, int sub_wlog,
                         int sub_hlog) {
        int ac = 64 - (1 << (sub_wlog + 1));
        int lc = 64 - (1 << (sub_hlog + 1));
        for (int i = 0; i < mi_w; i++) above_part[c + i] = ac;
        for (int i = 0; i < mi_h; i++) left_part[r + i] = lc;
    }
};

/* CDF carry across frames -------------------------------------------- */
/* The decoder saves end-of-frame CDFs into every refreshed slot (counts
   reset to zero) and a frame with primary_ref_frame != NONE inits from
   the referenced slot's saved state instead of the defaults.  The blob
   enumerates every table this packer models (tables never coded by our
   streams stay at their defaults on both sides, so they need no carry);
   layout: 17 int32 words (Cdf::v) per table, visit order below. */

template <class F>
static void visit_cdfs(Tile &T, F f) {
    for (auto &c : T.partition) f(c);
    for (auto &row : T.kf_y) for (auto &c : row) f(c);
    for (auto &row : T.uv_mode) for (auto &c : row) f(c);
    for (auto &c : T.angle_delta) f(c);
    for (auto &row : T.ext_tx2) for (auto &c : row) f(c);
    for (auto &c : T.skip) f(c);
    for (auto &row : T.txb_skip) for (auto &c : row) f(c);
    for (auto &row : T.eob_pt256) for (auto &c : row) f(c);
    for (auto &row : T.eob_pt64) for (auto &c : row) f(c);
    for (auto &row : T.eob_pt1024) for (auto &c : row) f(c);
    for (auto &row : T.eob_pt16) for (auto &c : row) f(c);
    for (auto &a : T.eob_extra) for (auto &row : a) for (auto &c : row) f(c);
    for (auto &a : T.base_eob) for (auto &row : a) for (auto &c : row) f(c);
    for (auto &a : T.base) for (auto &row : a) for (auto &c : row) f(c);
    for (auto &a : T.br) for (auto &row : a) for (auto &c : row) f(c);
    for (auto &row : T.dc_sign) for (auto &c : row) f(c);
    for (auto &c : T.intra_inter_c) f(c);
    for (auto &row : T.single_ref_c) for (auto &c : row) f(c);
    for (auto &c : T.newmv_c) f(c);
    for (auto &c : T.zeromv_c) f(c);
    for (auto &c : T.refmv_c) f(c);
    for (auto &c : T.drl_c) f(c);
    f(T.mv_joints_c);
    for (auto &c : T.mv_sign_c) f(c);
    for (auto &c : T.mv_classes_c) f(c);
    for (auto &c : T.mv_class0_c) f(c);
    for (auto &row : T.mv_class0_fp_c) for (auto &c : row) f(c);
    for (auto &c : T.mv_fp_c) f(c);
    for (auto &row : T.mv_bits_c) for (auto &c : row) f(c);
    for (auto &c : T.inter_tx3_c) f(c);
    for (auto &row : T.ext_tx1) for (auto &c : row) f(c);
    for (auto &row : T.tx_size_c) for (auto &c : row) f(c);
}

static void tile_dump_cdfs(Tile &T, int32_t *out) {
    visit_cdfs(T, [&](Cdf &c) {
        memcpy(out, c.v, sizeof(c.v));
        out += 17;
    });
}

static void tile_load_cdfs(Tile &T, const int32_t *in) {
    visit_cdfs(T, [&](Cdf &c) {
        memcpy(c.v, in, sizeof(c.v));
        c.count = 0;     // saved state has counters zeroed (spec 7.20)
        in += 17;
    });
}

static void tile_cdf_io(Tile &T, const int32_t *cdf_in, int32_t *cdf_out,
                        bool after) {
    if (!after && cdf_in) tile_load_cdfs(T, cdf_in);
    if (after && cdf_out) tile_dump_cdfs(T, cdf_out);
}

/* coefficient helpers ------------------------------------------------ */

static int base_ctx_offset(int row, int col) {  // square txs
    if (row == 0 && col == 0) return 0;
    int s = row + col;
    if (s < 2) return 1;
    if (s < 4) return 6;
    return 21;
}

// returns eob (count of coded coefficients in scan order)
static int compute_eob(const int32_t *lv, const int32_t *scan, int ncoef) {
    int eob = 0;
    for (int i = 0; i < ncoef; i++)
        if (lv[scan[i]]) eob = i + 1;
    return eob;
}

static void code_coeffs(Tile &T, int plane, int x, int y, int n,
                        const int32_t *lv, int tx_type_sym, int y_mode,
                        int n_ctx = 0, bool is_inter = false,
                        int intra_sub = 0) {
    // n = coded dim (4/8/16/32); n_ctx = tx dim (== n except TX_64X64
    // luma, where the tx is 64 but only the top-left 32x32 is coded);
    // intra_sub = parent intra block luma dim when the tx is a sub-block
    // of it (TX_MODE_SELECT depth > 0)
    if (!n_ctx) n_ctx = n;
    int txs = n_ctx == 64 ? 4
             : (n == 32 ? 3 : (n == 16 ? 2 : (n == 8 ? 1 : 0)));
    int ptype = plane ? 1 : 0;
    int x4 = x >> 2, y4 = y >> 2, w4 = n_ctx >> 2;
    const int32_t *scan = n == 32 ? &scan_32_32[0]
                         : (n == 16 ? &scan_16_16[0]
                            : (n == 8 ? &scan_8_8[0] : &scan_4_4[0]));
    int ncoef = n * n;

    // txb_skip ctx: block size == tx size -> 0 for luma (else the
    // spec's neighbor-level formula); 7+a+l chroma
    int ctx;
    if (plane == 0 && intra_sub > n) {
        int top = 0, left = 0;
        for (int i = 0; i < w4; i++) {
            if (T.a_lvl[0][x4 + i] > top) top = T.a_lvl[0][x4 + i];
            if (T.l_lvl[0][y4 + i] > left) left = T.l_lvl[0][y4 + i];
        }
        if (top == 0 && left == 0) ctx = 1;
        else if (top == 0 || left == 0)
            ctx = 2 + ((top > left ? top : left) > 3);
        else if ((top > left ? top : left) <= 3) ctx = 4;
        else if ((top < left ? top : left) <= 3) ctx = 5;
        else ctx = 6;
    } else if (plane == 0) ctx = 0;
    else {
        int a = 0, l = 0;
        for (int i = 0; i < w4; i++) {
            a |= (T.a_lvl[plane][x4 + i] | T.a_dc[plane][x4 + i]) != 0;
            l |= (T.l_lvl[plane][y4 + i] | T.l_dc[plane][y4 + i]) != 0;
        }
        ctx = 7 + a + l;
    }
    int eob = compute_eob(lv, scan, ncoef);
    T.co.sym(T.txb_skip[txs][ctx], eob == 0);
    if (eob == 0) {
        for (int i = 0; i < w4; i++) {
            T.a_lvl[plane][x4 + i] = 0; T.a_dc[plane][x4 + i] = 0;
        }
        for (int i = 0; i < w4; i++) {
            T.l_lvl[plane][y4 + i] = 0; T.l_dc[plane][y4 + i] = 0;
        }
        return;
    }
    if (plane == 0 && is_inter && n_ctx != 64) {
        // inter tx set 3 (reduced): {IDTX, DCT_DCT}; DCT index 1, cdf by
        // TX_SIZE_SQR (8 -> 1, 16 -> 2, 32 -> 3); TX_64X64 is set 0 (no
        // symbol) (av1tpu/spec/tile.py _code_tx_type_inter)
        T.co.sym(T.inter_tx3_c[n == 32 ? 3 : (n == 16 ? 2 : 1)], 1);
    } else if (plane == 0 && !is_inter && n == 16 && n_ctx == 16) {
        // tx type, intra set 2 (16x16), cdf indexed by [tx_sqr][y mode];
        // 32x32 is tx-set 0 (DCT only), chroma types are derived
        T.co.sym(T.ext_tx2[2][y_mode], tx_type_sym);
    } else if (plane == 0 && !is_inter && intra_sub > n) {
        // intra sub-tx (4x4/8x8): tx set 1, 7 symbols, [tx_sqr][y mode]
        T.co.sym(T.ext_tx1[n == 8 ? 1 : 0][y_mode], tx_type_sym);
    }
    // eob_pt (the 1024-coef table stores the 2D-class row first; smaller
    // tables store it second — see av1tpu/spec/tile.py is_1d_ctx)
    int eob_pt = eob <= 2 ? eob : (32 - __builtin_clz(eob - 1)) + 1;
    Cdf &ptcdf = n == 32 ? T.eob_pt1024[ptype][0]
                : (n == 16 ? T.eob_pt256[ptype][1]
                   : (n == 8 ? T.eob_pt64[ptype][1] : T.eob_pt16[ptype][1]));
    T.co.sym(ptcdf, eob_pt - 1);
    if (eob_pt > 2) {
        int ne = eob_pt - 2;
        int rem = eob - ((1 << (eob_pt - 2)) + 1);
        T.co.sym(T.eob_extra[txs][ptype][eob_pt - 3], (rem >> (ne - 1)) & 1);
        for (int i = 1; i < ne; i++)
            T.co.literal((rem >> (ne - 1 - i)) & 1, 1);
    }
    // levels, backward scan
    uint8_t pad[34 * 34];
    memset(pad, 0, sizeof(pad));
    const int stride = n + 2;
    for (int ci = eob - 1; ci >= 0; ci--) {
        int pos = scan[ci], row = pos / n, col = pos % n;
        int full = lv[pos] < 0 ? -lv[pos] : lv[pos];
        int coded = full < 3 ? full : 3;
        if (ci == eob - 1) {
            int ectx = ci == 0 ? 0 : ci <= ncoef / 8 ? 1 : ci <= ncoef / 4 ? 2 : 3;
            T.co.sym(T.base_eob[txs][ptype][ectx], coded - 1);
        } else {
            int mag = 0;
            int p0 = row * stride + col;
            int m;
            m = pad[p0 + 1]; mag += m < 3 ? m : 3;
            m = pad[p0 + stride]; mag += m < 3 ? m : 3;
            m = pad[p0 + stride + 1]; mag += m < 3 ? m : 3;
            m = pad[p0 + 2]; mag += m < 3 ? m : 3;
            m = pad[p0 + 2 * stride]; mag += m < 3 ? m : 3;
            int bctx = (mag + 1) >> 1;
            if (bctx > 4) bctx = 4;
            bctx += base_ctx_offset(row, col);
            if (pos == 0) bctx = 0;
            T.co.sym(T.base[txs][ptype][bctx], coded);
        }
        if (coded > 2) {
            int p0 = row * stride + col;
            int brmag = pad[p0 + 1] + pad[p0 + stride] + pad[p0 + stride + 1];
            int brctx = (brmag + 1) >> 1;
            if (brctx > 6) brctx = 6;
            if (pos != 0) brctx += (row < 2 && col < 2) ? 7 : 14;
            int brt = txs < 3 ? txs : 3;
            int cur = coded;
            for (int it = 0; it < 4; it++) {
                int inc = full - cur < 3 ? full - cur : 3;
                T.co.sym(T.br[brt][ptype][brctx], inc);
                cur += inc;
                if (inc < 3) break;
            }
            coded = cur;
        }
        pad[row * stride + col] = coded < 127 ? coded : 127;
    }
    // signs + golomb, forward
    int cul = 0, dccat = 0;
    for (int ci = 0; ci < eob; ci++) {
        int pos = scan[ci];
        int v = lv[pos];
        if (!v) continue;
        int sign = v < 0;
        int mag = sign ? -v : v;
        if (ci == 0) {
            int t = 0;
            for (int i = 0; i < w4; i++) {
                int av = T.a_dc[plane][x4 + i];
                t += av == 1 ? 1 : av == 2 ? -1 : 0;
                int lvv = T.l_dc[plane][y4 + i];
                t += lvv == 1 ? 1 : lvv == 2 ? -1 : 0;
            }
            int dctx = t == 0 ? 0 : t > 0 ? 2 : 1;
            T.co.sym(T.dc_sign[ptype][dctx], sign);
            dccat = sign ? 2 : 1;
        } else {
            T.co.literal(sign, 1);
        }
        if (mag > 14) {
            int g = mag - 15;
            int xg = g + 1;
            int nb = 32 - __builtin_clz(xg);
            for (int i = 0; i < nb - 1; i++) T.co.literal(0, 1);
            for (int i = nb - 1; i >= 0; i--) T.co.literal((xg >> i) & 1, 1);
        }
        cul += mag;
    }
    if (cul > 63) cul = 63;
    for (int i = 0; i < w4; i++) {
        T.a_lvl[plane][x4 + i] = cul; T.a_dc[plane][x4 + i] = dccat;
        T.l_lvl[plane][y4 + i] = cul; T.l_dc[plane][y4 + i] = dccat;
    }
}

/* block + partition ---------------------------------------------------- */

struct Grids {
    // dense mode: per-block level arrays
    const int32_t *ly = nullptr, *lu = nullptr, *lv = nullptr;
    // compact mode: significance bitmap (16 coefs/word, LSB first, layout
    // = all luma blocks then u then v) + packed nonzero values
    const uint16_t *bitmap = nullptr;
    const int16_t *vals = nullptr;
    // optional per-block luma modes (AV1 mode values; null = all V_PRED)
    const int16_t *modes = nullptr;
    // optional per-block luma tx depth (0..2; null = all depth 0)
    const int16_t *txd = nullptr;
    int uv_mode = 1;                       // chroma mode (V_PRED default)
    std::vector<uint32_t> voff;  // per-block value offset (y, then u, then v)
    int bcols = 0, brows = 0;
    // per-block scratch, filled by load()
    int32_t sy[256], su[64], sv[64];
    bool zy, zu, zv;

    void build_offsets() {
        int nb = bcols * brows;
        voff.resize(3 * nb);
        uint32_t acc = 0;
        size_t word = 0;
        for (int sect = 0; sect < 3; sect++) {
            int words_per = sect == 0 ? 16 : 4;
            for (int b = 0; b < nb; b++) {
                voff[sect * nb + b] = acc;
                for (int i = 0; i < words_per; i++)
                    acc += __builtin_popcount(bitmap[word++]);
            }
        }
    }

    static bool expand(const uint16_t *bm, int words, const int16_t *v,
                       uint32_t off, int32_t *out) {
        bool zero = true;
        memset(out, 0, (size_t)words * 16 * sizeof(int32_t));
        for (int w2 = 0; w2 < words; w2++) {
            unsigned m = bm[w2];
            while (m) {
                int t = __builtin_ctz(m);
                out[w2 * 16 + t] = v[off++];
                m &= m - 1;
                zero = false;
            }
        }
        return zero;
    }

    void load(int by, int bx) {
        int b = by * bcols + bx, nb = bcols * brows;
        if (bitmap) {
            zy = expand(bitmap + (size_t)b * 16, 16, vals, voff[b], sy);
            zu = expand(bitmap + (size_t)nb * 16 + (size_t)b * 4, 4, vals,
                        voff[nb + b], su);
            zv = expand(bitmap + (size_t)nb * 20 + (size_t)b * 4, 4, vals,
                        voff[2 * nb + b], sv);
        } else {
            const int32_t *py = ly + ((size_t)b) * 256;
            const int32_t *pu = lu + ((size_t)b) * 64;
            const int32_t *pv = lv + ((size_t)b) * 64;
            memcpy(sy, py, sizeof(sy));
            memcpy(su, pu, sizeof(su));
            memcpy(sv, pv, sizeof(sv));
            zy = zu = zv = true;
            for (int i = 0; i < 256 && zy; i++) zy = py[i] == 0;
            for (int i = 0; i < 64 && zu; i++) zu = pu[i] == 0;
            for (int i = 0; i < 64 && zv; i++) zv = pv[i] == 0;
        }
    }
};

// partition-mode input: compact sections [y16 | y32 | u8 | v8 | u16 | v16]
// + per-block modes and the per-region split map
struct GridsPart {
    const uint16_t *bitmap = nullptr;
    const int16_t *vals = nullptr;
    const int16_t *modes16 = nullptr;  // (brows16 x bcols16)
    const int16_t *modes32 = nullptr;  // (brows32 x bcols32)
    const int16_t *split = nullptr;    // (brows32 x bcols32), nonzero = split
    const int16_t *split64 = nullptr;  // (brows64 x bcols64)
    const int16_t *split16 = nullptr;  // (brows x bcols), nonzero = 4x 8x8
    int bcols = 0, brows = 0;          // 16px block grid
    int bcols32 = 0, brows32 = 0;
    int bcols64 = 0, brows64 = 0;
    size_t word_base[3];               // section word offsets
    std::vector<uint32_t> voff[3];     // per-block value offsets per section
    int32_t sy[256], su[64], sv[64];
    int32_t sy32[1024], su16[256], sv16[256];
    int32_t su32[1024], sv32[1024];
    int32_t sy8[64], su4[16], sv4[16];
    bool zy, zu, zv;

    // union layout: three sections only (y16 | u8 | v8); 32x32 / chroma-16
    // winners live in their region's four slots as raster quadrants
    void build_offsets() {
        int nb16 = bcols * brows;
        const int nblocks[3] = {nb16, nb16, nb16};
        const int wper[3] = {16, 4, 4};
        uint32_t acc = 0;
        size_t word = 0;
        for (int s = 0; s < 3; s++) {
            word_base[s] = word;
            voff[s].resize(nblocks[s]);
            for (int b = 0; b < nblocks[s]; b++) {
                voff[s][b] = acc;
                for (int i = 0; i < wper[s]; i++)
                    acc += __builtin_popcount(bitmap[word++]);
            }
        }
    }

    bool expand_sect(int sect, int b, int words, int32_t *out) {
        // returns true if any coefficient is nonzero
        return GridsExpand(bitmap + word_base[sect] + (size_t)b * words,
                           words, vals, voff[sect][b], out);
    }

    static bool GridsExpand(const uint16_t *bm, int words, const int16_t *v,
                            uint32_t off, int32_t *out) {
        bool nonzero = false;
        memset(out, 0, (size_t)words * 16 * sizeof(int32_t));
        for (int w2 = 0; w2 < words; w2++) {
            unsigned m = bm[w2];
            while (m) {
                int t = __builtin_ctz(m);
                out[w2 * 16 + t] = v[off++];
                m &= m - 1;
                nonzero = true;
            }
        }
        return nonzero;
    }

    void load16(int by, int bx) {
        int b = by * bcols + bx;
        zy = !expand_sect(0, b, 16, sy);
        zu = !expand_sect(1, b, 4, su);
        zv = !expand_sect(2, b, 4, sv);
    }
    void load8(int by8, int bx8) {
        // split-16 union layout: the four 8x8 luma sub-blocks occupy the
        // parent 16-slot's raster quadrants; chroma 4x4s the 8-slot's
        int32_t tmp[256];
        int b = (by8 >> 1) * bcols + (bx8 >> 1);
        int qr = by8 & 1, qc = bx8 & 1;
        expand_sect(0, b, 16, tmp);
        zy = true;
        for (int i = 0; i < 8; i++)
            for (int j = 0; j < 8; j++) {
                int32_t v2 = tmp[(qr * 8 + i) * 16 + qc * 8 + j];
                sy8[i * 8 + j] = v2;
                if (v2) zy = false;
            }
        expand_sect(1, b, 4, tmp);
        zu = true;
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 4; j++) {
                int32_t v2 = tmp[(qr * 4 + i) * 8 + qc * 4 + j];
                su4[i * 4 + j] = v2;
                if (v2) zu = false;
            }
        expand_sect(2, b, 4, tmp);
        zv = true;
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 4; j++) {
                int32_t v2 = tmp[(qr * 4 + i) * 8 + qc * 4 + j];
                sv4[i * 4 + j] = v2;
                if (v2) zv = false;
            }
    }
    void load64(int by64, int bx64) {
        // luma: coded 32x32 = 2x2 quadrants in the SB's top-left 16-slots;
        // chroma: 32x32 = the SB's 4x4 grid of 8-slots
        int32_t tmp[256];
        zy = zu = zv = true;
        for (int qr = 0; qr < 2; qr++)
            for (int qc = 0; qc < 2; qc++) {
                int b = (by64 * 4 + qr) * bcols + bx64 * 4 + qc;
                if (expand_sect(0, b, 16, tmp)) zy = false;
                for (int i = 0; i < 16; i++)
                    memcpy(&sy32[(qr * 16 + i) * 32 + qc * 16], &tmp[i * 16],
                           16 * sizeof(int32_t));
            }
        for (int tr = 0; tr < 4; tr++)
            for (int tc2 = 0; tc2 < 4; tc2++) {
                int b = (by64 * 4 + tr) * bcols + bx64 * 4 + tc2;
                if (expand_sect(1, b, 4, tmp)) zu = false;
                for (int i = 0; i < 8; i++)
                    memcpy(&su32[(tr * 8 + i) * 32 + tc2 * 8], &tmp[i * 8],
                           8 * sizeof(int32_t));
                if (expand_sect(2, b, 4, tmp)) zv = false;
                for (int i = 0; i < 8; i++)
                    memcpy(&sv32[(tr * 8 + i) * 32 + tc2 * 8], &tmp[i * 8],
                           8 * sizeof(int32_t));
            }
    }

    void load32(int by32, int bx32) {
        // reassemble the 2x2 raster quadrants from the region's 16-slots
        int32_t tmp[256];
        zy = zu = zv = true;
        for (int qr = 0; qr < 2; qr++)
            for (int qc = 0; qc < 2; qc++) {
                int b = (by32 * 2 + qr) * bcols + bx32 * 2 + qc;
                if (expand_sect(0, b, 16, tmp)) zy = false;
                for (int i = 0; i < 16; i++)
                    memcpy(&sy32[(qr * 16 + i) * 32 + qc * 16], &tmp[i * 16],
                           16 * sizeof(int32_t));
                if (expand_sect(1, b, 4, tmp)) zu = false;
                for (int i = 0; i < 8; i++)
                    memcpy(&su16[(qr * 8 + i) * 16 + qc * 8], &tmp[i * 8],
                           8 * sizeof(int32_t));
                if (expand_sect(2, b, 4, tmp)) zv = false;
                for (int i = 0; i < 8; i++)
                    memcpy(&sv16[(qr * 8 + i) * 16 + qc * 8], &tmp[i * 8],
                           8 * sizeof(int32_t));
            }
    }
};

static const int INTRA_MODE_CTX[13] = {0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0};

// block header + residual syntax shared by every block size.
// n = luma dim (16 or 32); levels pointers already expanded.
static void code_block_common(Tile &T, int r, int c, int n, int mode,
                              const int32_t *ly, const int32_t *lu,
                              const int32_t *lvp, bool zy, bool zu,
                              bool zv, int uv = 1 /* V_PRED */,
                              int txd = 0) {
    int skip = zy && zu && zv;
    int mi = n / 4;

    int sctx = (r > 0 ? T.above_skip[c] : 0) + (c > 0 ? T.left_skip[r] : 0);
    T.co.sym(T.skip[sctx], skip);

    int am = r > 0 ? T.above_mode[c] : 0;
    int lm = c > 0 ? T.left_mode[r] : 0;
    T.co.sym(T.kf_y[am][lm], mode);
    if (mode >= 1 && mode <= 8)           // directional: angle delta 0
        T.co.sym(T.angle_delta[mode - 1], 3);
    int cfl_allowed = n <= 32;            // spec: w,h <= 32
    T.co.sym(T.uv_mode[cfl_allowed][mode], uv);
    if (uv >= 1 && uv <= 8)               // directional uv: angle delta 0
        T.co.sym(T.angle_delta[uv - 1], 3);

    if (T.tx_select && n < 64) {
        // luma tx depth (spec read_tx_size; intra codes it even on skip):
        // category = TX_SIZE_SQR_UP(max tx) - 1; ctx from above/left dims
        int cat = n == 32 ? 2 : (n == 16 ? 1 : 0);
        int a = T.above_txw[c] >= n, l = T.left_txh[r] >= n;
        int ctx = (r > 0 && c > 0) ? a + l : (r > 0 ? a : (c > 0 ? l : 0));
        T.co.sym(T.tx_size_c[cat][ctx], txd);
        int txn = skip ? n : (n >> txd);
        for (int i = 0; i < mi; i++) {
            T.above_txw[c + i] = txn;
            T.left_txh[r + i] = txn;
        }
    }

    for (int i = 0; i < mi; i++) {
        T.above_skip[c + i] = skip;
        T.left_skip[r + i] = skip;
        T.above_mode[c + i] = INTRA_MODE_CTX[mode];
        T.left_mode[r + i] = INTRA_MODE_CTX[mode];
    }

    if (!skip) {
        // TX_64X64 luma codes a 32x32 area; its chroma is one 32x32 DCT
        int nly = n == 64 ? 32 : n;
        // TX_SET_INTRA_2 symbol per luma mode (spec Mode_To_Txfm into
        // [IDTX, DCT_DCT, ADST_ADST, ADST_DCT, DCT_ADST]); DCT when the
        // pipeline is DCT-only (tx_from_mode = 0)
        static const int kTx2SymForMode[13] =
            {1, 3, 4, 1, 2, 3, 4, 4, 3, 2, 3, 4, 2};
        int txsym = T.tx_from_mode ? kTx2SymForMode[mode] : 1;
        if (txd > 0 && n <= 32) {
            // sub-tx luma: raster tx blocks, tx set 1 symbol per block
            // (spec Mode_To_Txfm into [IDTX, DCT_DCT, V_DCT, H_DCT,
            // ADST_ADST, ADST_DCT, DCT_ADST])
            static const int kTx1SymForMode[13] =
                {1, 5, 6, 1, 4, 5, 6, 6, 5, 4, 5, 6, 4};
            int txsym1 = T.tx_from_mode ? kTx1SymForMode[mode] : 1;
            int nt = n >> txd;
            int32_t sub[256];
            for (int sy2 = 0; sy2 < n; sy2 += nt)
                for (int sx = 0; sx < n; sx += nt) {
                    for (int i = 0; i < nt; i++)
                        for (int j = 0; j < nt; j++)
                            sub[i * nt + j] = ly[(sy2 + i) * n + sx + j];
                    code_coeffs(T, 0, c * 4 + sx, r * 4 + sy2, nt, sub,
                                txsym1, mode, 0, false, n);
                }
        } else {
            code_coeffs(T, 0, c * 4, r * 4, nly, ly, txsym, mode, n);
        }
        code_coeffs(T, 1, c * 2, r * 2, n / 2, lu, 0, 0);
        code_coeffs(T, 2, c * 2, r * 2, n / 2, lvp, 0, 0);
    } else {
        for (int p = 0; p < 3; p++) {
            int sub = p ? 1 : 0;
            int x4 = (c * 4 >> sub) >> 2, y4 = (r * 4 >> sub) >> 2;
            int w4 = (n >> sub) >> 2;
            for (int i = 0; i < w4; i++) {
                T.a_lvl[p][x4 + i] = 0; T.a_dc[p][x4 + i] = 0;
                T.l_lvl[p][y4 + i] = 0; T.l_dc[p][y4 + i] = 0;
            }
        }
    }
    int lg = n == 64 ? 4 : (n == 32 ? 3 : 2);
    T.update_part_ctx(r, c, mi, mi, lg, lg);
}

static void code_block(Tile &T, Grids &G, int r, int c) {
    // r, c in mi units; block = 16x16 at (bx, by)
    int by = r / 4, bx = c / 4;
    G.load(by, bx);
    int mode = G.modes ? (int)G.modes[(size_t)by * G.bcols + bx] : 1;
    int txd = G.txd ? (int)G.txd[(size_t)by * G.bcols + bx] : 0;
    code_block_common(T, r, c, 16, mode, G.sy, G.su, G.sv, G.zy, G.zu,
                      G.zv, G.uv_mode, txd);
}

static void code_partition_part(Tile &T, GridsPart &G, int r, int c,
                                int bsl) {
    if (r >= T.mi_rows || c >= T.mi_cols) return;
    int ctx = (bsl - 1) * 4 + T.part_ctx(r, c, bsl);
    if (bsl == 4) {
        int by64 = r / 16, bx64 = c / 16;
        size_t reg = (size_t)by64 * G.bcols64 + bx64;
        if (!G.split64[reg]) {
            T.co.sym(T.partition[ctx], 0);  // NONE -> one 64x64 block
            G.load64(by64, bx64);
            code_block_common(T, r, c, 64, 1, G.sy32, G.su32, G.sv32,
                              G.zy, G.zu, G.zv);
            return;
        }
    }
    if (bsl == 2) {
        T.co.sym(T.partition[ctx], 0);  // NONE
        int by = r / 4, bx = c / 4;
        G.load16(by, bx);
        int mode = (int)G.modes16[(size_t)by * G.bcols + bx];
        code_block_common(T, r, c, 16, mode, G.sy, G.su, G.sv, G.zy, G.zu,
                          G.zv);
        return;
    }
    if (bsl == 3) {
        int by32 = r / 8, bx32 = c / 8;
        size_t reg = (size_t)by32 * G.bcols32 + bx32;
        if (!G.split[reg]) {
            T.co.sym(T.partition[ctx], 0);  // NONE -> one 32x32 block
            G.load32(by32, bx32);
            int mode = (int)G.modes32[reg];
            code_block_common(T, r, c, 32, mode, G.sy32, G.su16, G.sv16,
                              G.zy, G.zu, G.zv);
            return;
        }
    }
    T.co.sym(T.partition[ctx], 3);      // SPLIT
    int half = 1 << (bsl - 1);
    code_partition_part(T, G, r, c, bsl - 1);
    code_partition_part(T, G, r, c + half, bsl - 1);
    code_partition_part(T, G, r + half, c, bsl - 1);
    code_partition_part(T, G, r + half, c + half, bsl - 1);
}

static void code_partition(Tile &T, Grids &G, int r, int c, int bsl) {
    // bsl: 4 = 64x64, 3 = 32x32, 2 = 16x16 (mi width log2)
    if (r >= T.mi_rows || c >= T.mi_cols) return;
    int ctx = (bsl - 1) * 4 + T.part_ctx(r, c, bsl);
    if (bsl == 2) {
        T.co.sym(T.partition[ctx], 0);  // NONE
        code_block(T, G, r, c);
        return;
    }
    T.co.sym(T.partition[ctx], 3);      // SPLIT
    int half = 1 << (bsl - 1);
    code_partition(T, G, r, c, bsl - 1);
    code_partition(T, G, r, c + half, bsl - 1);
    code_partition(T, G, r + half, c, bsl - 1);
    code_partition(T, G, r + half, c + half, bsl - 1);
}

/* inter frame -------------------------------------------------------- */
/* Uniform 16x16 inter/LAST grid (the TPU inter pipeline's shape,
 * av1tpu/models/inter_v.py).  Ports the spec engine's MV stack
 * (av1tpu/spec/mv.py MvStackBuilder) specialized to bw4=bh4=4 and
 * all-coded-blocks-inter; byte-identical to the Python engine
 * (tests/test_inter_packer.py). */

constexpr int REF_CAT_LEVEL = 640;
constexpr int MV_BORDER = 128;

struct MvStack {
    int mv[8][2];
    int weights[8];
    int len = 0;          // real candidates found
    int num_found = 0;    // == len (global padding does not count)
    int new_mv_ctx = 0, ref_mv_ctx = 0, zero_mv_ctx = 0;
    int new_mv_count = 0;
    int ref = 1;          // candidates must match this reference
    bool found_match = false;

    void add(Tile &T, int mr, int mc, int weight) {
        size_t i = (size_t)mr * T.mi_cols + mc;
        if (!T.mi_coded[i] || T.mi_ref[i] != ref) return;
        int cr = T.mi_mv_r[i], cc = T.mi_mv_c[i];
        int idx = -1;
        for (int k = 0; k < len; k++)
            if (mv[k][0] == cr && mv[k][1] == cc) { idx = k; break; }
        if (idx >= 0) weights[idx] += weight;
        else if (len < 8) {
            mv[len][0] = cr; mv[len][1] = cc; weights[len++] = weight;
        }
        if (T.mi_newmv[i]) new_mv_count++;
        found_match = true;
    }

    void add_extra(Tile &T, int mr, int mc) {
        // extra single-ref fill takes candidates regardless of ref frame
        // (spec add_extra_mv_candidate, single prediction; engine
        // _add_extra_candidate)
        size_t i = (size_t)mr * T.mi_cols + mc;
        if (!T.mi_coded[i]) return;
        if (len >= 2) return;
        int cr = T.mi_mv_r[i], cc = T.mi_mv_c[i];
        for (int k = 0; k < len; k++)
            if (mv[k][0] == cr && mv[k][1] == cc) return;
        mv[len][0] = cr; mv[len][1] = cc; weights[len++] = 2;
    }
};

static int drl_ctx_of(const MvStack &st, int idx) {
    bool a = st.weights[idx] >= REF_CAT_LEVEL;
    bool b = st.weights[idx + 1] >= REF_CAT_LEVEL;
    if (a && b) return 0;
    if (a && !b) return 1;
    if (!a && !b) return 2;
    return 0;
}

// General square-block MV stack over mixed 16/32/64 inter neighbors
// (av1tpu/spec/mv.py MvStackBuilder; bw4 == bh4 in {4, 8, 16}, r/c are
// multiples of bw4 so the odd-mi adjustment terms vanish)
static void build_mv_stack(Tile &T, int r, int c, int bw4, MvStack &st,
                           int ref = 1) {
    st.ref = ref;
    const int bh4 = bw4;
    bool has_above = r > 0, has_left = c > 0;
    int max_row_offset = 0, max_col_offset = 0;
    if (has_above) {
        max_row_offset = -6;                 // -(MVREF_ROW_COLS << 1)
        if (max_row_offset < -r) max_row_offset = -r;
    }
    if (has_left) {
        max_col_offset = -6;
        if (max_col_offset < -c) max_col_offset = -c;
    }

    int processed_rows = 0, processed_cols = 0;
    bool found_above = false, found_left = false;

    auto inside = [&](int mr, int mc) {
        return mr >= 0 && mc >= 0 && mr < T.mi_rows && mc < T.mi_cols;
    };
    auto scan_row = [&](int delta_row, int processed) {
        int end4 = bw4 < T.mi_cols - c ? bw4 : T.mi_cols - c;
        if (end4 > 16) end4 = 16;
        int delta_col = 0;
        int dr = delta_row;
        bool use_step_16 = bw4 >= 16;
        if (dr < -1 || dr > 1) {             // |delta_row| > 1
            dr += r & 1;                     // r % bw4 == 0 -> unchanged
            delta_col = 1 - (c & 1);         // -> 1
        }
        int i = 0, np = processed;
        while (i < end4) {
            int mr = r + dr, mc = c + delta_col + i;
            if (!inside(mr, mc)) break;
            int n4w = T.mi_n4[(size_t)mr * T.mi_cols + mc];
            int length = bw4 < n4w ? bw4 : n4w;
            if (use_step_16) length = length > 4 ? length : 4;
            else if (dr < -1 || dr > 1) length = length > 2 ? length : 2;
            int weight = 2;
            if (bw4 >= 2 && bw4 <= n4w) {
                int inc = -max_row_offset + dr + 1;
                if (inc > n4w) inc = n4w;    // n4h == n4w (square blocks)
                if (inc > weight) weight = inc;
                if (inc - dr - 1 > np) np = inc - dr - 1;
            }
            st.add(T, mr, mc, length * weight);
            i += length;
        }
        return np;
    };
    auto scan_col = [&](int delta_col, int processed) {
        int end4 = bh4 < T.mi_rows - r ? bh4 : T.mi_rows - r;
        if (end4 > 16) end4 = 16;
        int delta_row = 0;
        int dc = delta_col;
        bool use_step_16 = bh4 >= 16;
        if (dc < -1 || dc > 1) {
            delta_row = 1 - (r & 1);
            dc += c & 1;
        }
        int i = 0, np = processed;
        while (i < end4) {
            int mr = r + delta_row + i, mc = c + dc;
            if (!inside(mr, mc)) break;
            int n4h = T.mi_n4[(size_t)mr * T.mi_cols + mc];
            int length = bh4 < n4h ? bh4 : n4h;
            if (use_step_16) length = length > 4 ? length : 4;
            else if (dc < -1 || dc > 1) length = length > 2 ? length : 2;
            int weight = 2;
            if (bh4 >= 2 && bh4 <= n4h) {
                int inc = -max_col_offset + dc + 1;
                if (inc > n4h) inc = n4h;
                if (inc > weight) weight = inc;
                if (inc - dc - 1 > np) np = inc - dc - 1;
            }
            st.add(T, mr, mc, length * weight);
            i += length;
        }
        return np;
    };

    if (max_row_offset) {
        st.found_match = false;
        processed_rows = scan_row(-1, 0);
        found_above |= st.found_match;
    }
    if (max_col_offset) {
        st.found_match = false;
        processed_cols = scan_col(-1, 0);
        found_left |= st.found_match;
    }
    // top-right point (max(bw4,bh4) <= 16 always)
    if (r - 1 >= 0 && c + bw4 < T.mi_cols) {
        st.found_match = false;
        st.add(T, r - 1, c + bw4, 4);
        found_above |= st.found_match;
    }

    int close_matches = (int)found_above + (int)found_left;
    int num_nearest = st.len;
    int num_new = st.new_mv_count;
    for (int i = 0; i < num_nearest; i++) st.weights[i] += REF_CAT_LEVEL;
    st.zero_mv_ctx = 0;                     // no temporal MVs

    // top-left point
    if (r - 1 >= 0 && c - 1 >= 0) {
        st.found_match = false;
        st.add(T, r - 1, c - 1, 4);
        found_above |= st.found_match;
    }

    for (int idx = 2; idx <= 3; idx++) {
        int row_offset = -(idx << 1) + 1;   // -3, -5 (adj terms are 0)
        int col_offset = -(idx << 1) + 1;
        int aro = -row_offset, amr = -max_row_offset;
        if (aro <= amr && aro > processed_rows) {
            st.found_match = false;
            processed_rows = scan_row(row_offset, processed_rows);
            found_above |= st.found_match;
        }
        int aco = -col_offset, amc = -max_col_offset;
        if (aco <= amc && aco > processed_cols) {
            st.found_match = false;
            processed_cols = scan_col(col_offset, processed_cols);
            found_left |= st.found_match;
        }
    }

    int total_matches = (int)found_above + (int)found_left;
    if (close_matches == 0) {
        st.new_mv_ctx = total_matches < 1 ? total_matches : 1;
        st.ref_mv_ctx = total_matches;
    } else if (close_matches == 1) {
        st.new_mv_ctx = 3 - (num_new < 1 ? num_new : 1);
        st.ref_mv_ctx = 2 + total_matches;
    } else {
        st.new_mv_ctx = 5 - (num_new < 1 ? num_new : 1);
        st.ref_mv_ctx = 5;
    }

    // stable sort by weight: nearest segment, then the rest
    auto stable_sort = [&](int lo, int hi) {
        for (int i = lo + 1; i < hi; i++) {
            int wv = st.weights[i], m0 = st.mv[i][0], m1 = st.mv[i][1];
            int j = i - 1;
            while (j >= lo && st.weights[j] < wv) {
                st.weights[j + 1] = st.weights[j];
                st.mv[j + 1][0] = st.mv[j][0];
                st.mv[j + 1][1] = st.mv[j][1];
                j--;
            }
            st.weights[j + 1] = wv; st.mv[j + 1][0] = m0;
            st.mv[j + 1][1] = m1;
        }
    };
    stable_sort(0, num_nearest);
    stable_sort(num_nearest, st.len);

    if (st.len < 2) {
        // extra single-ref fill: walk the above row, then the left column
        if (has_above) {
            int w4 = bw4 < T.mi_cols - c ? bw4 : T.mi_cols - c;
            if (w4 > 16) w4 = 16;
            int i = 0;
            while (i < w4 && st.len < 2) {
                int mr = r - 1, mc = c + i;
                if (!inside(mr, mc)) break;
                st.add_extra(T, mr, mc);
                int n4w = T.mi_n4[(size_t)mr * T.mi_cols + mc];
                i += bw4 < n4w ? bw4 : n4w;
            }
        }
        if (has_left) {
            int h4 = bh4 < T.mi_rows - r ? bh4 : T.mi_rows - r;
            if (h4 > 16) h4 = 16;
            int i = 0;
            while (i < h4 && st.len < 2) {
                int mr = r + i, mc = c - 1;
                if (!inside(mr, mc)) break;
                st.add_extra(T, mr, mc);
                int n4h = T.mi_n4[(size_t)mr * T.mi_cols + mc];
                i += bh4 < n4h ? bh4 : n4h;
            }
        }
    }
    st.num_found = st.len;
    while (st.len < 2) {                    // global-mv padding (not counted)
        st.mv[st.len][0] = 0; st.mv[st.len][1] = 0;
        st.weights[st.len++] = 2;
    }

    // clamp to the motion-range border
    int border_w = MV_BORDER + bw4 * 4 * 8;
    int border_h = MV_BORDER + bh4 * 4 * 8;
    int lo_r = -r * 32 - border_h;
    int hi_r = (T.mi_rows - bh4 - r) * 32 + border_h;
    int lo_c = -c * 32 - border_w;
    int hi_c = (T.mi_cols - bw4 - c) * 32 + border_w;
    for (int i = 0; i < st.len; i++) {
        if (st.mv[i][0] < lo_r) st.mv[i][0] = lo_r;
        if (st.mv[i][0] > hi_r) st.mv[i][0] = hi_r;
        if (st.mv[i][1] < lo_c) st.mv[i][1] = lo_c;
        if (st.mv[i][1] > hi_c) st.mv[i][1] = hi_c;
    }
}

// one MV component difference (spec 5.11.32; allow_high_precision_mv=0,
// so the hp bit is implied 1 and magnitudes must be even 1/8-pel)
static void code_mv_component(Tile &T, int comp, int value) {
    int sign = value < 0;
    int mag = sign ? -value : value;
    int z = mag - 1;
    int mv_class = z < 16 ? 0 : 31 - __builtin_clz((unsigned)(z >> 3));
    T.co.sym(T.mv_sign_c[comp], sign);
    T.co.sym(T.mv_classes_c[comp], mv_class);
    if (mv_class == 0) {
        int bit = z >> 3;
        int fr = (z >> 1) & 3;
        T.co.sym(T.mv_class0_c[comp], bit);
        T.co.sym(T.mv_class0_fp_c[comp][bit], fr);
    } else {
        int base = 2 << (mv_class + 2);
        int rem = z - base;
        int d = rem >> 3;
        int fr = (rem >> 1) & 3;
        for (int i = 0; i < mv_class; i++)
            T.co.sym(T.mv_bits_c[comp][i], (d >> i) & 1);
        T.co.sym(T.mv_fp_c[comp], fr);
    }
}

static void code_mv(Tile &T, const int *pred, const int *mvv) {
    int dr = mvv[0] - pred[0], dc = mvv[1] - pred[1];
    int joint = dr ? (dc ? 3 : 2) : (dc ? 1 : 0);
    T.co.sym(T.mv_joints_c, joint);
    if (dr) code_mv_component(T, 0, dr);
    if (dc) code_mv_component(T, 1, dc);
}

enum { M_NEARESTMV = 0, M_NEARMV = 1, M_GLOBALMV = 2, M_NEWMV = 3 };

// header + residual syntax for one inter block of luma size n (16/32/64);
// levels pointers already expanded (ly: coded luma area, lu/lv: chroma)
static void code_block_inter_common(Tile &T, const int16_t *mv_rows,
                                    const int16_t *mv_cols, int mv_cols_n,
                                    int mv_shift,
                                    int r, int c, int n, const int32_t *ly,
                                    const int32_t *lu, const int32_t *lvp,
                                    bool zy, bool zu, bool zv) {
    // MV grid granularity: mv_shift=2 -> per-16-block grid (the uniform
    // path), mv_shift=1 -> per-8-block grid (split-16 transport); larger
    // blocks read their top-left entry either way
    size_t b = (size_t)(r >> mv_shift) * mv_cols_n + (c >> mv_shift);
    int mvv[2] = {mv_rows[b], mv_cols[b]};
    int mi = n / 4;
    // block reference: per-16-block grid (merged 32/64 blocks take their
    // top-left entry; the merge RDO only merges equal-ref blocks; 8x8
    // sub-blocks inherit the parent 16's reference)
    size_t b16 = (size_t)(r / 4) * (T.mi_cols / 4) + (c / 4);
    int refv = (T.ref_grid && T.ref_grid[b16]) ? 4 : 1;  // LAST=1 GOLDEN=4

    MvStack st;
    build_mv_stack(T, r, c, mi, st, refv);

    // cheapest signaling for this MV against the stack
    // (av1tpu/models/inter_host.py _cheapest_inter_mode)
    int mode, ref_mv_idx = 0;
    if (mvv[0] == 0 && mvv[1] == 0) mode = M_GLOBALMV;
    else if (st.num_found >= 1 && mvv[0] == st.mv[0][0]
             && mvv[1] == st.mv[0][1]) mode = M_NEARESTMV;
    else if (st.num_found >= 2 && mvv[0] == st.mv[1][0]
             && mvv[1] == st.mv[1][1]) mode = M_NEARMV;
    else mode = M_NEWMV;

    int skip = zy && zu && zv;
    int sctx = (r > 0 ? T.above_skip[c] : 0) + (c > 0 ? T.left_skip[r] : 0);
    T.co.sym(T.skip[sctx], skip);

    // intra_inter: every neighbor is inter, so the ctx is always 0
    T.co.sym(T.intra_inter_c[0], 1);

    // single-ref tree (spec read_ref_frames / av1tpu/spec/tile.py
    // _code_single_ref): LAST or GOLDEN, contexts from the above/left
    // neighbors' references (every coded neighbor here is inter)
    int cnt1 = 0, cnt4 = 0;
    if (r > 0) {
        size_t i = (size_t)(r - 1) * T.mi_cols + c;
        if (T.mi_coded[i]) (T.mi_ref[i] == 4 ? cnt4 : cnt1)++;
    }
    if (c > 0) {
        size_t i = (size_t)r * T.mi_cols + (c - 1);
        if (T.mi_coded[i]) (T.mi_ref[i] == 4 ? cnt4 : cnt1)++;
    }
    auto ctx3 = [](int a, int bb) { return a == bb ? 1 : (a < bb ? 0 : 2); };
    T.co.sym(T.single_ref_c[ctx3(cnt1 + cnt4, 0)][0], 0);    // fwd group
    int golden = refv == 4;
    T.co.sym(T.single_ref_c[ctx3(cnt1, cnt4)][2], golden);   // L/L2 vs L3/G
    if (golden)
        T.co.sym(T.single_ref_c[ctx3(0, cnt4)][4], 1);       // L3 vs GOLDEN
    else
        T.co.sym(T.single_ref_c[ctx3(cnt1, 0)][3], 0);       // LAST vs L2

    T.co.sym(T.newmv_c[st.new_mv_ctx], mode != M_NEWMV);
    if (mode != M_NEWMV) {
        T.co.sym(T.zeromv_c[st.zero_mv_ctx], mode != M_GLOBALMV);
        if (mode != M_GLOBALMV)
            T.co.sym(T.refmv_c[st.ref_mv_ctx], mode != M_NEARESTMV);
    }
    if (mode == M_NEWMV) {
        for (int idx = 0; idx < 2; idx++)
            if (st.num_found > idx + 1) {
                T.co.sym(T.drl_c[drl_ctx_of(st, idx)], ref_mv_idx != idx);
                if (ref_mv_idx == idx) break;
            }
    } else if (mode == M_NEARMV) {
        for (int idx = 1; idx < 3; idx++)
            if (st.num_found > idx + 1) {
                T.co.sym(T.drl_c[drl_ctx_of(st, idx)],
                         ref_mv_idx + 1 != idx);
                if (ref_mv_idx + 1 == idx) break;
            }
    }
    if (mode == M_NEWMV) code_mv(T, st.mv[ref_mv_idx], mvv);

    // neighbor state updates over the block's mi range
    for (int i = 0; i < mi; i++) {
        T.above_skip[c + i] = skip;
        T.left_skip[r + i] = skip;
    }
    for (int dr2 = 0; dr2 < mi; dr2++)
        for (int dc2 = 0; dc2 < mi; dc2++) {
            size_t i = (size_t)(r + dr2) * T.mi_cols + c + dc2;
            T.mi_mv_r[i] = mvv[0]; T.mi_mv_c[i] = mvv[1];
            T.mi_newmv[i] = mode == M_NEWMV;
            T.mi_coded[i] = 1;
            T.mi_n4[i] = (int8_t)mi;
            T.mi_ref[i] = (int8_t)refv;
        }

    if (!skip) {
        // luma: TX_64X64 codes only the top-left 32x32; tx-type symbol for
        // inter set 3 at 16/32, none at 64 (set 0)
        int nly = n == 64 ? 32 : n;
        code_coeffs(T, 0, c * 4, r * 4, nly, ly, 0, 0, n, true);
        code_coeffs(T, 1, c * 2, r * 2, n / 2, lu, 0, 0);
        code_coeffs(T, 2, c * 2, r * 2, n / 2, lvp, 0, 0);
    } else {
        for (int p = 0; p < 3; p++) {
            int sub = p ? 1 : 0;
            int x4 = (c * 4 >> sub) >> 2, y4 = (r * 4 >> sub) >> 2;
            int w4 = (n >> sub) >> 2;
            for (int i = 0; i < w4; i++) {
                T.a_lvl[p][x4 + i] = 0; T.a_dc[p][x4 + i] = 0;
                T.l_lvl[p][y4 + i] = 0; T.l_dc[p][y4 + i] = 0;
            }
        }
    }
    int lg = n == 64 ? 4 : (n == 32 ? 3 : (n == 16 ? 2 : 1));
    T.update_part_ctx(r, c, mi, mi, lg, lg);
}

static void code_block_inter(Tile &T, Grids &G, const int16_t *mv_rows,
                             const int16_t *mv_cols, int r, int c) {
    G.load(r / 4, c / 4);
    code_block_inter_common(T, mv_rows, mv_cols, G.bcols, 2, r, c, 16,
                            G.sy, G.su, G.sv, G.zy, G.zu, G.zv);
}

static void code_partition_inter(Tile &T, Grids &G, const int16_t *mv_rows,
                                 const int16_t *mv_cols, int r, int c,
                                 int bsl) {
    if (r >= T.mi_rows || c >= T.mi_cols) return;
    int ctx = (bsl - 1) * 4 + T.part_ctx(r, c, bsl);
    if (bsl == 2) {
        T.co.sym(T.partition[ctx], 0);      // NONE
        code_block_inter(T, G, mv_rows, mv_cols, r, c);
        return;
    }
    T.co.sym(T.partition[ctx], 3);          // SPLIT
    int half = 1 << (bsl - 1);
    code_partition_inter(T, G, mv_rows, mv_cols, r, c, bsl - 1);
    code_partition_inter(T, G, mv_rows, mv_cols, r, c + half, bsl - 1);
    code_partition_inter(T, G, mv_rows, mv_cols, r + half, c, bsl - 1);
    code_partition_inter(T, G, mv_rows, mv_cols, r + half, c + half,
                         bsl - 1);
}

// partitioned inter: split maps choose NONE at 64/32, leaves at 16 or
// (with a split16 map) 8x8 quads with per-8-block MVs
// (av1tpu/models/inter_v.py encode_inter_part; union layout per GridsPart)
static void code_partition_inter_part(Tile &T, GridsPart &G,
                                      const int16_t *mv_rows,
                                      const int16_t *mv_cols, int mv_shift,
                                      const int16_t *split32,
                                      const int16_t *split64,
                                      int r, int c, int bsl) {
    if (r >= T.mi_rows || c >= T.mi_cols) return;
    int mvc = mv_shift == 1 ? G.bcols * 2 : G.bcols;
    int ctx = (bsl - 1) * 4 + T.part_ctx(r, c, bsl);
    if (bsl == 4) {
        int by64 = r / 16, bx64 = c / 16;
        if (!split64[(size_t)by64 * G.bcols64 + bx64]) {
            T.co.sym(T.partition[ctx], 0);  // NONE -> one 64x64 block
            G.load64(by64, bx64);
            code_block_inter_common(T, mv_rows, mv_cols, mvc, mv_shift,
                                    r, c, 64,
                                    G.sy32, G.su32, G.sv32, G.zy, G.zu,
                                    G.zv);
            return;
        }
    }
    if (bsl == 3) {
        int by32 = r / 8, bx32 = c / 8;
        if (!split32[(size_t)by32 * G.bcols32 + bx32]) {
            T.co.sym(T.partition[ctx], 0);  // NONE -> one 32x32 block
            G.load32(by32, bx32);
            code_block_inter_common(T, mv_rows, mv_cols, mvc, mv_shift,
                                    r, c, 32,
                                    G.sy32, G.su16, G.sv16, G.zy, G.zu,
                                    G.zv);
            return;
        }
    }
    if (bsl == 2
        && !(G.split16 && G.split16[(size_t)(r / 4) * G.bcols + c / 4])) {
        T.co.sym(T.partition[ctx], 0);      // NONE
        G.load16(r / 4, c / 4);
        code_block_inter_common(T, mv_rows, mv_cols, mvc, mv_shift,
                                r, c, 16,
                                G.sy, G.su, G.sv, G.zy, G.zu, G.zv);
        return;
    }
    if (bsl == 1) {
        T.co.sym(T.partition[ctx], 0);      // NONE (4-symbol 8x8 cdf)
        G.load8(r / 2, c / 2);
        code_block_inter_common(T, mv_rows, mv_cols, mvc, mv_shift,
                                r, c, 8,
                                G.sy8, G.su4, G.sv4, G.zy, G.zu, G.zv);
        return;
    }
    T.co.sym(T.partition[ctx], 3);          // SPLIT
    int half = 1 << (bsl - 1);
    code_partition_inter_part(T, G, mv_rows, mv_cols, mv_shift, split32,
                              split64, r, c, bsl - 1);
    code_partition_inter_part(T, G, mv_rows, mv_cols, mv_shift, split32,
                              split64, r, c + half, bsl - 1);
    code_partition_inter_part(T, G, mv_rows, mv_cols, mv_shift, split32,
                              split64, r + half, c, bsl - 1);
    code_partition_inter_part(T, G, mv_rows, mv_cols, mv_shift, split32,
                              split64, r + half, c + half, bsl - 1);
}

}  // namespace

extern "C" {

// words in a CDF carry blob (17 int32 per modeled table, visit_cdfs order)
int av1pack_cdf_words(void) {
    Tile T;
    T.init(0, 16, 16);
    T.init_inter();
    int n = 0;
    visit_cdfs(T, [&](Cdf &) { n += 17; });
    return n;
}

static size_t run_pack(Tile &T, Grids &G, int mi_rows, int mi_cols,
                       uint8_t *out, size_t cap, int32_t *cdf_out) {
    for (int r = 0; r < mi_rows; r += 16)
        for (int c = 0; c < mi_cols; c += 16)
            code_partition(T, G, r, c, 4);
    size_t n = T.co.ec.done(out, cap);
    tile_cdf_io(T, nullptr, cdf_out, true);
    return n;
}

size_t pack_tile_v1(const int32_t *ly, const int32_t *lu, const int32_t *lv,
                    int mi_rows, int mi_cols, int qindex, int disable_update,
                    uint8_t *out, size_t cap) {
    Tile T;
    T.init(qindex, mi_rows, mi_cols);
    T.co.update = !disable_update;
    Grids G;
    G.ly = ly; G.lu = lu; G.lv = lv;
    G.bcols = mi_cols / 4; G.brows = mi_rows / 4;
    return run_pack(T, G, mi_rows, mi_cols, out, cap, nullptr);
}

// compact input: significance bitmap + packed nonzero values (see
// av1tpu/models/intra_v.py encode_intra_v_compact for the layout)
// partition-aware input (32/16 mixed; see av1tpu/models/intra_part.py)
size_t pack_tile_v3(const uint16_t *bitmap, const int16_t *vals,
                    const int16_t *modes16, const int16_t *modes32,
                    const int16_t *split, const int16_t *split64,
                    int mi_rows, int mi_cols, int qindex, int disable_update,
                    uint8_t *out, size_t cap,
                    const int32_t *cdf_in, int32_t *cdf_out) {
    Tile T;
    T.init(qindex, mi_rows, mi_cols);
    T.init_inter();     // blob covers inter tables too (stay at defaults)
    tile_cdf_io(T, cdf_in, nullptr, false);
    T.co.update = !disable_update;
    GridsPart G;
    G.bitmap = bitmap; G.vals = vals;
    G.modes16 = modes16; G.modes32 = modes32; G.split = split;
    G.split64 = split64;
    G.bcols = mi_cols / 4; G.brows = mi_rows / 4;
    G.bcols32 = mi_cols / 8; G.brows32 = mi_rows / 8;
    G.bcols64 = mi_cols / 16; G.brows64 = mi_rows / 16;
    G.build_offsets();
    for (int r = 0; r < mi_rows; r += 16)
        for (int c = 0; c < mi_cols; c += 16)
            code_partition_part(T, G, r, c, 4);
    size_t n = T.co.ec.done(out, cap);
    tile_cdf_io(T, nullptr, cdf_out, true);
    return n;
}

// inter tile: uniform 16x16 inter/LAST blocks; compact levels layout
// [y16 | u8 | v8] (see av1tpu/models/inter_v.py _compact) + per-block MV
// grids in 1/8-pel units
size_t pack_tile_inter(const uint16_t *bitmap, const int16_t *vals,
                       const int16_t *mv_rows, const int16_t *mv_cols,
                       const int16_t *refs,
                       int mi_rows, int mi_cols, int qindex,
                       int disable_update, uint8_t *out, size_t cap,
                       const int32_t *cdf_in, int32_t *cdf_out) {
    Tile T;
    T.init(qindex, mi_rows, mi_cols);
    T.init_inter();
    T.ref_grid = refs;
    tile_cdf_io(T, cdf_in, nullptr, false);
    T.co.update = !disable_update;
    Grids G;
    G.bitmap = bitmap; G.vals = vals;
    G.bcols = mi_cols / 4; G.brows = mi_rows / 4;
    G.build_offsets();
    for (int r = 0; r < mi_rows; r += 16)
        for (int c = 0; c < mi_cols; c += 16)
            code_partition_inter(T, G, mv_rows, mv_cols, r, c, 4);
    size_t n = T.co.ec.done(out, cap);
    tile_cdf_io(T, nullptr, cdf_out, true);
    return n;
}

// partitioned inter tile: union-layout levels (y16 | u8 | v8 with 32/64
// winners in their regions' slots and split-16 8x8 quads in their parent
// slot's quadrants, see av1tpu/models/inter_v.py _gop_step_part) + split
// maps + MV grids.  split16 may be null (no 8x8 leaves).  mv_per8: 1 ->
// mv grids are per-8-block (mi_cols/2 wide; required when split16 is
// given), 0 -> per-16-block (legacy transport).
size_t pack_tile_inter_part(const uint16_t *bitmap, const int16_t *vals,
                            const int16_t *split16,
                            const int16_t *split32, const int16_t *split64,
                            const int16_t *mv_rows, const int16_t *mv_cols,
                            int mv_per8, const int16_t *refs,
                            int mi_rows, int mi_cols, int qindex,
                            int disable_update, uint8_t *out, size_t cap,
                            const int32_t *cdf_in, int32_t *cdf_out) {
    Tile T;
    T.init(qindex, mi_rows, mi_cols);
    T.init_inter();
    T.ref_grid = refs;
    tile_cdf_io(T, cdf_in, nullptr, false);
    T.co.update = !disable_update;
    GridsPart G;
    G.bitmap = bitmap; G.vals = vals;
    G.split16 = split16;
    G.bcols = mi_cols / 4; G.brows = mi_rows / 4;
    G.bcols32 = mi_cols / 8; G.brows32 = mi_rows / 8;
    G.bcols64 = mi_cols / 16; G.brows64 = mi_rows / 16;
    G.build_offsets();
    int mv_shift = mv_per8 ? 1 : 2;
    for (int r = 0; r < mi_rows; r += 16)
        for (int c = 0; c < mi_cols; c += 16)
            code_partition_inter_part(T, G, mv_rows, mv_cols, mv_shift,
                                      split32, split64, r, c, 4);
    size_t n = T.co.ec.done(out, cap);
    tile_cdf_io(T, nullptr, cdf_out, true);
    return n;
}

size_t pack_tile_v2(const uint16_t *bitmap, const int16_t *vals,
                    const int16_t *modes,
                    int mi_rows, int mi_cols, int qindex, int disable_update,
                    uint8_t *out, size_t cap) {
    Tile T;
    T.init(qindex, mi_rows, mi_cols);
    T.co.update = !disable_update;
    Grids G;
    G.bitmap = bitmap; G.vals = vals; G.modes = modes;
    G.bcols = mi_cols / 4; G.brows = mi_rows / 4;
    G.build_offsets();
    return run_pack(T, G, mi_rows, mi_cols, out, cap, nullptr);
}

// v2 with an explicit chroma mode (the wavefront keyframe pipeline codes
// uv DC_PRED; see av1tpu/models/intra_wave.py)
size_t pack_tile_v2_uv(const uint16_t *bitmap, const int16_t *vals,
                       const int16_t *modes, int uv_mode, int tx_from_mode,
                       int mi_rows, int mi_cols, int qindex,
                       int disable_update, uint8_t *out, size_t cap,
                       const int32_t *cdf_in, int32_t *cdf_out,
                       const int16_t *txd) {
    Tile T;
    T.init(qindex, mi_rows, mi_cols);
    T.init_inter();     // blob covers inter tables too (stay at defaults)
    T.tx_from_mode = tx_from_mode;
    T.tx_select = txd != nullptr;  // frame header signals TX_MODE_SELECT
    tile_cdf_io(T, cdf_in, nullptr, false);
    T.co.update = !disable_update;
    Grids G;
    G.bitmap = bitmap; G.vals = vals; G.modes = modes; G.txd = txd;
    G.uv_mode = uv_mode;
    G.bcols = mi_cols / 4; G.brows = mi_rows / 4;
    G.build_offsets();
    return run_pack(T, G, mi_rows, mi_cols, out, cap, cdf_out);
}

}  // extern "C"
