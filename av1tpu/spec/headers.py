"""AV1 sequence/frame header syntax (spec sections 5.5, 5.9).

Parser covers the intra/keyframe subset the framework exchanges with the
system encoders (used to validate our understanding against libaom/SVT
output); writer emits the minimal conformant headers for the TPU encoder's
own streams.  Inter-frame reference management is handled for the fields
that appear in intra streams; unsupported features raise.
"""

from __future__ import annotations

import dataclasses

from .bits import BitReader, BitWriter

KEY_FRAME = 0
INTER_FRAME = 1
INTRA_ONLY_FRAME = 2
SWITCH_FRAME = 3

PRIMARY_REF_NONE = 7
NUM_REF_FRAMES = 8

TX_MODE_ONLY_4X4 = 0
TX_MODE_LARGEST = 1
TX_MODE_SELECT = 2


@dataclasses.dataclass
class SequenceHeader:
    seq_profile: int = 0
    still_picture: int = 0
    reduced_still_picture_header: int = 0
    seq_level_idx: int = 8
    seq_tier: int = 0
    frame_width_bits: int = 16
    frame_height_bits: int = 16
    max_frame_width: int = 0
    max_frame_height: int = 0
    frame_id_numbers_present: int = 0
    delta_frame_id_length: int = 0
    additional_frame_id_length: int = 0
    use_128x128_superblock: int = 0
    enable_filter_intra: int = 0
    enable_intra_edge_filter: int = 0
    enable_interintra_compound: int = 0
    enable_masked_compound: int = 0
    enable_warped_motion: int = 0
    enable_dual_filter: int = 0
    enable_order_hint: int = 0
    enable_jnt_comp: int = 0
    enable_ref_frame_mvs: int = 0
    seq_force_screen_content_tools: int = 0
    seq_force_integer_mv: int = 0
    order_hint_bits: int = 0
    enable_superres: int = 0
    enable_cdef: int = 0
    enable_restoration: int = 0
    # color config
    bit_depth: int = 8
    mono_chrome: int = 0
    color_primaries: int = 2  # unspecified
    transfer_characteristics: int = 2
    matrix_coefficients: int = 2
    color_description_present: int = 0
    color_range: int = 0
    subsampling_x: int = 1
    subsampling_y: int = 1
    chroma_sample_position: int = 0
    separate_uv_delta_q: int = 0
    film_grain_params_present: int = 0

    @property
    def num_planes(self) -> int:
        return 1 if self.mono_chrome else 3

    @property
    def sb_size(self) -> int:
        return 128 if self.use_128x128_superblock else 64


@dataclasses.dataclass
class TileInfo:
    uniform_spacing: int = 1
    tile_cols_log2: int = 0
    tile_rows_log2: int = 0
    tile_cols: int = 1
    tile_rows: int = 1
    mi_col_starts: list = dataclasses.field(default_factory=list)
    mi_row_starts: list = dataclasses.field(default_factory=list)
    context_update_tile_id: int = 0
    tile_size_bytes: int = 4


@dataclasses.dataclass
class FrameHeader:
    frame_type: int = KEY_FRAME
    show_frame: int = 1
    showable_frame: int = 0
    error_resilient_mode: int = 0
    disable_cdf_update: int = 0
    allow_screen_content_tools: int = 0
    force_integer_mv: int = 1
    frame_size_override: int = 0
    order_hint: int = 0
    primary_ref_frame: int = PRIMARY_REF_NONE
    refresh_frame_flags: int = 0xFF
    # inter: which of the 8 ref slots each of LAST..ALTREF points to
    ref_frame_idx: tuple = (0, 0, 0, 0, 0, 0, 0)
    width: int = 0
    height: int = 0
    render_width: int = 0
    render_height: int = 0
    use_superres: int = 0
    allow_intrabc: int = 0
    disable_frame_end_update_cdf: int = 0
    tiles: TileInfo = dataclasses.field(default_factory=TileInfo)
    # quantization
    base_q_idx: int = 0
    delta_q_y_dc: int = 0
    delta_q_u_dc: int = 0
    delta_q_u_ac: int = 0
    delta_q_v_dc: int = 0
    delta_q_v_ac: int = 0
    using_qmatrix: int = 0
    qm_y: int = 0
    qm_u: int = 0
    qm_v: int = 0
    segmentation_enabled: int = 0
    delta_q_present: int = 0
    delta_q_res: int = 0
    delta_lf_present: int = 0
    delta_lf_res: int = 0
    delta_lf_multi: int = 0
    coded_lossless: int = 0
    all_lossless: int = 0
    # loop filter
    loop_filter_level: tuple = (0, 0, 0, 0)
    loop_filter_sharpness: int = 0
    loop_filter_delta_enabled: int = 0
    loop_filter_ref_deltas: tuple = (1, 0, 0, 0, -1, 0, -1, -1)
    loop_filter_mode_deltas: tuple = (0, 0)
    # cdef
    cdef_damping: int = 3
    cdef_bits: int = 0
    cdef_y_pri_strength: tuple = (0,)
    cdef_y_sec_strength: tuple = (0,)
    cdef_uv_pri_strength: tuple = (0,)
    cdef_uv_sec_strength: tuple = (0,)
    # loop restoration
    lr_type: tuple = (0, 0, 0)
    lr_unit_shift: int = 0
    lr_uv_shift: int = 0
    # modes
    tx_mode: int = TX_MODE_LARGEST
    reduced_tx_set: int = 0
    apply_grain: int = 0

    @property
    def mi_cols(self) -> int:
        return 2 * ((self.width + 7) >> 3)

    @property
    def mi_rows(self) -> int:
        return 2 * ((self.height + 7) >> 3)

    def q_idx(self) -> int:
        return self.base_q_idx


def tile_log2(blk_size: int, target: int) -> int:
    k = 0
    while (blk_size << k) < target:
        k += 1
    return k


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def parse_sequence_header(payload: bytes) -> SequenceHeader:
    br = BitReader(payload)
    s = SequenceHeader()
    s.seq_profile = br.f(3)
    s.still_picture = br.f(1)
    s.reduced_still_picture_header = br.f(1)
    if s.reduced_still_picture_header:
        s.seq_level_idx = br.f(5)
    else:
        timing_info_present = br.f(1)
        if timing_info_present:
            raise NotImplementedError("timing_info")
        initial_display_delay_present = br.f(1)
        op_cnt = br.f(5) + 1
        for i in range(op_cnt):
            br.f(12)  # operating_point_idc
            level = br.f(5)
            if i == 0:
                s.seq_level_idx = level
            if level > 7:
                tier = br.f(1)
                if i == 0:
                    s.seq_tier = tier
            if initial_display_delay_present:
                if br.f(1):
                    br.f(4)
    s.frame_width_bits = br.f(4) + 1
    s.frame_height_bits = br.f(4) + 1
    s.max_frame_width = br.f(s.frame_width_bits) + 1
    s.max_frame_height = br.f(s.frame_height_bits) + 1
    if not s.reduced_still_picture_header:
        s.frame_id_numbers_present = br.f(1)
    if s.frame_id_numbers_present:
        s.delta_frame_id_length = br.f(4) + 2
        s.additional_frame_id_length = br.f(3) + 1
    s.use_128x128_superblock = br.f(1)
    s.enable_filter_intra = br.f(1)
    s.enable_intra_edge_filter = br.f(1)
    if not s.reduced_still_picture_header:
        s.enable_interintra_compound = br.f(1)
        s.enable_masked_compound = br.f(1)
        s.enable_warped_motion = br.f(1)
        s.enable_dual_filter = br.f(1)
        s.enable_order_hint = br.f(1)
        if s.enable_order_hint:
            s.enable_jnt_comp = br.f(1)
            s.enable_ref_frame_mvs = br.f(1)
        if br.f(1):  # seq_choose_screen_content_tools
            s.seq_force_screen_content_tools = 2
        else:
            s.seq_force_screen_content_tools = br.f(1)
        if s.seq_force_screen_content_tools > 0:
            if br.f(1):  # seq_choose_integer_mv
                s.seq_force_integer_mv = 2
            else:
                s.seq_force_integer_mv = br.f(1)
        else:
            s.seq_force_integer_mv = 2
        if s.enable_order_hint:
            s.order_hint_bits = br.f(3) + 1
    s.enable_superres = br.f(1)
    s.enable_cdef = br.f(1)
    s.enable_restoration = br.f(1)
    _parse_color_config(br, s)
    s.film_grain_params_present = br.f(1)
    return s


def _parse_color_config(br: BitReader, s: SequenceHeader) -> None:
    high_bitdepth = br.f(1)
    if s.seq_profile == 2 and high_bitdepth:
        s.bit_depth = 12 if br.f(1) else 10
    else:
        s.bit_depth = 10 if high_bitdepth else 8
    if s.seq_profile == 1:
        s.mono_chrome = 0
    else:
        s.mono_chrome = br.f(1)
    s.color_description_present = br.f(1)
    if s.color_description_present:
        s.color_primaries = br.f(8)
        s.transfer_characteristics = br.f(8)
        s.matrix_coefficients = br.f(8)
    if s.mono_chrome:
        s.color_range = br.f(1)
        s.subsampling_x = s.subsampling_y = 1
        s.chroma_sample_position = 0
        s.separate_uv_delta_q = 0
        return
    if (s.color_primaries == 1 and s.transfer_characteristics == 13
            and s.matrix_coefficients == 0):
        s.color_range = 1
        s.subsampling_x = s.subsampling_y = 0
    else:
        s.color_range = br.f(1)
        if s.seq_profile == 0:
            s.subsampling_x = s.subsampling_y = 1
        elif s.seq_profile == 1:
            s.subsampling_x = s.subsampling_y = 0
        else:
            if s.bit_depth == 12:
                s.subsampling_x = br.f(1)
                s.subsampling_y = br.f(1) if s.subsampling_x else 0
            else:
                s.subsampling_x, s.subsampling_y = 1, 0
        if s.subsampling_x and s.subsampling_y:
            s.chroma_sample_position = br.f(2)
    s.separate_uv_delta_q = br.f(1)


def _read_delta_q(br: BitReader) -> int:
    if br.f(1):
        return br.su(7)
    return 0


def parse_frame_header(payload: bytes, seq: SequenceHeader) -> tuple[FrameHeader, int]:
    """Parse an (uncompressed) frame header.  Returns (header, bit position
    after the header, before byte alignment) so OBU_FRAME parsing can locate
    the tile group payload."""
    br = BitReader(payload)
    fh = FrameHeader()
    if seq.reduced_still_picture_header:
        fh.frame_type = KEY_FRAME
        fh.show_frame = 1
    else:
        if br.f(1):  # show_existing_frame
            raise NotImplementedError("show_existing_frame")
        fh.frame_type = br.f(2)
        frame_is_intra = fh.frame_type in (KEY_FRAME, INTRA_ONLY_FRAME)
        if not frame_is_intra:
            raise NotImplementedError("inter frame parsing")
        fh.show_frame = br.f(1)
        if fh.show_frame:
            fh.showable_frame = int(fh.frame_type != KEY_FRAME)
        else:
            fh.showable_frame = br.f(1)
        if fh.frame_type == SWITCH_FRAME or (
            fh.frame_type == KEY_FRAME and fh.show_frame
        ):
            fh.error_resilient_mode = 1
        else:
            fh.error_resilient_mode = br.f(1)
    fh.disable_cdf_update = br.f(1)
    if seq.seq_force_screen_content_tools == 2:
        fh.allow_screen_content_tools = br.f(1)
    else:
        fh.allow_screen_content_tools = seq.seq_force_screen_content_tools
    fh.force_integer_mv = 1  # intra
    if seq.frame_id_numbers_present:
        br.f(seq.delta_frame_id_length + seq.additional_frame_id_length)
    if fh.frame_type == SWITCH_FRAME:
        fh.frame_size_override = 1
    elif seq.reduced_still_picture_header:
        fh.frame_size_override = 0
    else:
        fh.frame_size_override = br.f(1)
    fh.order_hint = br.f(seq.order_hint_bits) if seq.enable_order_hint else 0
    fh.primary_ref_frame = PRIMARY_REF_NONE
    if fh.frame_type == SWITCH_FRAME or (
        fh.frame_type == KEY_FRAME and fh.show_frame
    ):
        fh.refresh_frame_flags = 0xFF
    else:
        fh.refresh_frame_flags = br.f(8)
    # intra path: frame_size + render_size
    if fh.frame_size_override:
        fh.width = br.f(seq.frame_width_bits) + 1
        fh.height = br.f(seq.frame_height_bits) + 1
    else:
        fh.width = seq.max_frame_width
        fh.height = seq.max_frame_height
    if seq.enable_superres:
        fh.use_superres = br.f(1)
        if fh.use_superres:
            raise NotImplementedError("superres")
    if br.f(1):  # render_and_frame_size_different
        fh.render_width = br.f(16) + 1
        fh.render_height = br.f(16) + 1
    else:
        fh.render_width, fh.render_height = fh.width, fh.height
    if fh.allow_screen_content_tools:
        fh.allow_intrabc = br.f(1)
    if seq.reduced_still_picture_header or fh.disable_cdf_update:
        fh.disable_frame_end_update_cdf = 1
    else:
        fh.disable_frame_end_update_cdf = br.f(1)
    _parse_tile_info(br, seq, fh)
    _parse_quantization(br, seq, fh)
    _parse_segmentation(br, fh)
    # delta q / delta lf
    if fh.base_q_idx > 0:
        fh.delta_q_present = br.f(1)
    if fh.delta_q_present:
        fh.delta_q_res = br.f(2)
        if not fh.allow_intrabc:
            fh.delta_lf_present = br.f(1)
        if fh.delta_lf_present:
            fh.delta_lf_res = br.f(2)
            fh.delta_lf_multi = br.f(1)
    _compute_lossless(fh)
    _parse_loop_filter(br, seq, fh)
    _parse_cdef(br, seq, fh)
    _parse_lr(br, seq, fh)
    # tx mode
    if fh.coded_lossless:
        fh.tx_mode = TX_MODE_ONLY_4X4
    else:
        fh.tx_mode = TX_MODE_SELECT if br.f(1) else TX_MODE_LARGEST
    # frame_reference_mode / skip_mode: no bits for intra frames
    fh.reduced_tx_set = br.f(1)
    # global motion: no bits for intra
    if seq.film_grain_params_present and (fh.show_frame or fh.showable_frame):
        fh.apply_grain = br.f(1)
        if fh.apply_grain:
            raise NotImplementedError("film grain parsing")
    return fh, br.pos


def _parse_tile_info(br: BitReader, seq: SequenceHeader, fh: FrameHeader):
    t = fh.tiles
    sb_shift = 5 if seq.use_128x128_superblock else 4
    sb_cols = (fh.mi_cols + (1 << sb_shift) - 1) >> sb_shift
    sb_rows = (fh.mi_rows + (1 << sb_shift) - 1) >> sb_shift
    sb_size = sb_shift + 2
    max_tile_width_sb = 4096 >> sb_size
    max_tile_area_sb = (4096 * 2304) >> (2 * sb_size)
    min_log2_cols = tile_log2(max_tile_width_sb, sb_cols)
    max_log2_cols = tile_log2(1, min(sb_cols, 64))
    max_log2_rows = tile_log2(1, min(sb_rows, 64))
    min_log2_tiles = max(
        min_log2_cols, tile_log2(max_tile_area_sb, sb_rows * sb_cols)
    )
    t.uniform_spacing = br.f(1)
    if t.uniform_spacing:
        t.tile_cols_log2 = min_log2_cols
        while t.tile_cols_log2 < max_log2_cols:
            if br.f(1):
                t.tile_cols_log2 += 1
            else:
                break
        tile_width_sb = (sb_cols + (1 << t.tile_cols_log2) - 1) >> t.tile_cols_log2
        t.mi_col_starts = [
            min(i * (tile_width_sb << sb_shift), fh.mi_cols)
            for i in range(0, (sb_cols + tile_width_sb - 1) // tile_width_sb + 1)
        ]
        t.tile_cols = len(t.mi_col_starts) - 1
        min_log2_rows = max(min_log2_tiles - t.tile_cols_log2, 0)
        t.tile_rows_log2 = min_log2_rows
        while t.tile_rows_log2 < max_log2_rows:
            if br.f(1):
                t.tile_rows_log2 += 1
            else:
                break
        tile_height_sb = (sb_rows + (1 << t.tile_rows_log2) - 1) >> t.tile_rows_log2
        t.mi_row_starts = [
            min(i * (tile_height_sb << sb_shift), fh.mi_rows)
            for i in range(0, (sb_rows + tile_height_sb - 1) // tile_height_sb + 1)
        ]
        t.tile_rows = len(t.mi_row_starts) - 1
    else:
        # non-uniform spacing
        t.mi_col_starts, start_sb, i = [0], 0, 0
        while start_sb < sb_cols:
            max_width = min(sb_cols - start_sb, max_tile_width_sb)
            width_in_sbs = br.ns(max_width) + 1
            start_sb += width_in_sbs
            t.mi_col_starts.append(min(start_sb << sb_shift, fh.mi_cols))
            i += 1
        t.tile_cols = i
        t.tile_cols_log2 = tile_log2(1, t.tile_cols)
        max_tile_height_sb = max(max_tile_area_sb // max(1, start_sb), 1)
        t.mi_row_starts, start_sb, i = [0], 0, 0
        while start_sb < sb_rows:
            max_height = min(sb_rows - start_sb, max_tile_height_sb)
            height_in_sbs = br.ns(max_height) + 1
            start_sb += height_in_sbs
            t.mi_row_starts.append(min(start_sb << sb_shift, fh.mi_rows))
            i += 1
        t.tile_rows = i
        t.tile_rows_log2 = tile_log2(1, t.tile_rows)
    if t.tile_cols_log2 > 0 or t.tile_rows_log2 > 0:
        t.context_update_tile_id = br.f(t.tile_rows_log2 + t.tile_cols_log2)
        t.tile_size_bytes = br.f(2) + 1


def _parse_quantization(br: BitReader, seq: SequenceHeader, fh: FrameHeader):
    fh.base_q_idx = br.f(8)
    fh.delta_q_y_dc = _read_delta_q(br)
    if seq.num_planes > 1:
        diff_uv_delta = br.f(1) if seq.separate_uv_delta_q else 0
        fh.delta_q_u_dc = _read_delta_q(br)
        fh.delta_q_u_ac = _read_delta_q(br)
        if diff_uv_delta:
            fh.delta_q_v_dc = _read_delta_q(br)
            fh.delta_q_v_ac = _read_delta_q(br)
        else:
            fh.delta_q_v_dc = fh.delta_q_u_dc
            fh.delta_q_v_ac = fh.delta_q_u_ac
    fh.using_qmatrix = br.f(1)
    if fh.using_qmatrix:
        fh.qm_y = br.f(4)
        fh.qm_u = br.f(4)
        if seq.separate_uv_delta_q:
            fh.qm_v = br.f(4)
        else:
            fh.qm_v = fh.qm_u


def _parse_segmentation(br: BitReader, fh: FrameHeader):
    fh.segmentation_enabled = br.f(1)
    if fh.segmentation_enabled:
        raise NotImplementedError("segmentation")


def _compute_lossless(fh: FrameHeader):
    # all segments share base_q_idx here (no segmentation)
    fh.coded_lossless = int(
        fh.base_q_idx == 0 and fh.delta_q_y_dc == 0
        and fh.delta_q_u_dc == 0 and fh.delta_q_u_ac == 0
        and fh.delta_q_v_dc == 0 and fh.delta_q_v_ac == 0
    )
    fh.all_lossless = fh.coded_lossless and not fh.use_superres


def _parse_loop_filter(br: BitReader, seq: SequenceHeader, fh: FrameHeader):
    if fh.coded_lossless or fh.allow_intrabc:
        fh.loop_filter_level = (0, 0, 0, 0)
        return
    l0 = br.f(6)
    l1 = br.f(6)
    l2 = l3 = 0
    if seq.num_planes > 1 and (l0 or l1):
        l2 = br.f(6)
        l3 = br.f(6)
    fh.loop_filter_level = (l0, l1, l2, l3)
    fh.loop_filter_sharpness = br.f(3)
    fh.loop_filter_delta_enabled = br.f(1)
    if fh.loop_filter_delta_enabled:
        if br.f(1):  # delta update
            ref_deltas = list(fh.loop_filter_ref_deltas)
            for i in range(8):
                if br.f(1):
                    ref_deltas[i] = br.su(7)
            fh.loop_filter_ref_deltas = tuple(ref_deltas)
            mode_deltas = list(fh.loop_filter_mode_deltas)
            for i in range(2):
                if br.f(1):
                    mode_deltas[i] = br.su(7)
            fh.loop_filter_mode_deltas = tuple(mode_deltas)


def _parse_cdef(br: BitReader, seq: SequenceHeader, fh: FrameHeader):
    if fh.coded_lossless or fh.allow_intrabc or not seq.enable_cdef:
        return
    fh.cdef_damping = br.f(2) + 3
    fh.cdef_bits = br.f(2)
    n = 1 << fh.cdef_bits
    yp, ys, up, us = [], [], [], []
    for _ in range(n):
        yp.append(br.f(4))
        ys.append(br.f(2))
        up.append(br.f(4))
        us.append(br.f(2))
    fh.cdef_y_pri_strength = tuple(yp)
    fh.cdef_y_sec_strength = tuple(ys)
    fh.cdef_uv_pri_strength = tuple(up)
    fh.cdef_uv_sec_strength = tuple(us)


def _parse_lr(br: BitReader, seq: SequenceHeader, fh: FrameHeader):
    if fh.all_lossless or fh.allow_intrabc or not seq.enable_restoration:
        return
    types = [br.f(2) for _ in range(seq.num_planes)]
    fh.lr_type = tuple(types)
    uses_lr = any(types)
    uses_chroma_lr = any(types[1:])
    if uses_lr:
        if seq.use_128x128_superblock:
            fh.lr_unit_shift = br.f(1) + 1
        else:
            fh.lr_unit_shift = br.f(1)
            if fh.lr_unit_shift:
                fh.lr_unit_shift += br.f(1)
        if seq.subsampling_x and seq.subsampling_y and uses_chroma_lr:
            fh.lr_uv_shift = br.f(1)


# ---------------------------------------------------------------------------
# writing (minimal conformant intra encoder headers)
# ---------------------------------------------------------------------------


def write_sequence_header(seq: SequenceHeader) -> bytes:
    bw = BitWriter()
    bw.f(seq.seq_profile, 3)
    bw.f(seq.still_picture, 1)
    bw.f(seq.reduced_still_picture_header, 1)
    assert not seq.reduced_still_picture_header
    bw.f(0, 1)  # timing_info_present
    bw.f(0, 1)  # initial_display_delay_present
    bw.f(0, 5)  # operating_points_cnt_minus_1
    bw.f(0, 12)  # operating_point_idc[0]
    bw.f(seq.seq_level_idx, 5)
    if seq.seq_level_idx > 7:
        bw.f(seq.seq_tier, 1)
    bw.f(seq.frame_width_bits - 1, 4)
    bw.f(seq.frame_height_bits - 1, 4)
    bw.f(seq.max_frame_width - 1, seq.frame_width_bits)
    bw.f(seq.max_frame_height - 1, seq.frame_height_bits)
    bw.f(seq.frame_id_numbers_present, 1)
    assert not seq.frame_id_numbers_present
    bw.f(seq.use_128x128_superblock, 1)
    bw.f(seq.enable_filter_intra, 1)
    bw.f(seq.enable_intra_edge_filter, 1)
    bw.f(seq.enable_interintra_compound, 1)
    bw.f(seq.enable_masked_compound, 1)
    bw.f(seq.enable_warped_motion, 1)
    bw.f(seq.enable_dual_filter, 1)
    bw.f(seq.enable_order_hint, 1)
    if seq.enable_order_hint:
        bw.f(seq.enable_jnt_comp, 1)
        bw.f(seq.enable_ref_frame_mvs, 1)
    if seq.seq_force_screen_content_tools == 2:
        bw.f(1, 1)
    else:
        bw.f(0, 1)
        bw.f(seq.seq_force_screen_content_tools, 1)
    if seq.seq_force_screen_content_tools > 0:
        if seq.seq_force_integer_mv == 2:
            bw.f(1, 1)
        else:
            bw.f(0, 1)
            bw.f(seq.seq_force_integer_mv, 1)
    if seq.enable_order_hint:
        bw.f(seq.order_hint_bits - 1, 3)
    bw.f(seq.enable_superres, 1)
    bw.f(seq.enable_cdef, 1)
    bw.f(seq.enable_restoration, 1)
    # color config
    high = int(seq.bit_depth > 8)
    bw.f(high, 1)
    if seq.seq_profile == 2 and high:
        bw.f(int(seq.bit_depth == 12), 1)
    if seq.seq_profile != 1:
        bw.f(seq.mono_chrome, 1)
    bw.f(seq.color_description_present, 1)
    if seq.color_description_present:
        bw.f(seq.color_primaries, 8)
        bw.f(seq.transfer_characteristics, 8)
        bw.f(seq.matrix_coefficients, 8)
    if not seq.mono_chrome:
        bw.f(seq.color_range, 1)
        if seq.seq_profile == 0:
            pass  # 4:2:0 implied
        else:
            raise NotImplementedError
        if seq.subsampling_x and seq.subsampling_y:
            bw.f(seq.chroma_sample_position, 2)
        bw.f(seq.separate_uv_delta_q, 1)
    else:
        bw.f(seq.color_range, 1)
    bw.f(seq.film_grain_params_present, 1)
    bw.trailing_bits()
    return bw.bytes()


def write_frame_header_key(
    seq: SequenceHeader, fh: FrameHeader, bw: BitWriter
) -> BitWriter:
    """Write an intra KEY frame header (without trailing bits: the caller
    appends tile group data when packing an OBU_FRAME)."""
    assert fh.frame_type == KEY_FRAME and fh.show_frame
    bw.f(0, 1)  # show_existing_frame
    bw.f(KEY_FRAME, 2)
    bw.f(1, 1)  # show_frame
    # error_resilient implied 1 for shown keyframes
    bw.f(fh.disable_cdf_update, 1)
    if seq.seq_force_screen_content_tools == 2:
        bw.f(fh.allow_screen_content_tools, 1)
    bw.f(fh.frame_size_override, 1)
    if seq.enable_order_hint:
        bw.f(fh.order_hint, seq.order_hint_bits)
    # refresh_frame_flags implied all for shown keyframe
    if fh.frame_size_override:
        bw.f(fh.width - 1, seq.frame_width_bits)
        bw.f(fh.height - 1, seq.frame_height_bits)
    if seq.enable_superres:
        bw.f(0, 1)
    bw.f(0, 1)  # render size same
    if fh.allow_screen_content_tools:
        bw.f(fh.allow_intrabc, 1)
    if not fh.disable_cdf_update:
        bw.f(fh.disable_frame_end_update_cdf, 1)
    _write_tile_info(bw, seq, fh)
    _write_quantization(bw, seq, fh)
    bw.f(0, 1)  # segmentation_enabled
    if fh.base_q_idx > 0:
        bw.f(fh.delta_q_present, 1)
    if fh.delta_q_present:
        bw.f(fh.delta_q_res, 2)
        if not fh.allow_intrabc:
            bw.f(fh.delta_lf_present, 1)
        if fh.delta_lf_present:
            bw.f(fh.delta_lf_res, 2)
            bw.f(fh.delta_lf_multi, 1)
    _compute_lossless(fh)
    # loop filter
    if not (fh.coded_lossless or fh.allow_intrabc):
        l0, l1, l2, l3 = fh.loop_filter_level
        bw.f(l0, 6)
        bw.f(l1, 6)
        if seq.num_planes > 1 and (l0 or l1):
            bw.f(l2, 6)
            bw.f(l3, 6)
        bw.f(fh.loop_filter_sharpness, 3)
        bw.f(fh.loop_filter_delta_enabled, 1)
        if fh.loop_filter_delta_enabled:
            bw.f(0, 1)  # no delta updates
    # cdef
    if not (fh.coded_lossless or fh.allow_intrabc) and seq.enable_cdef:
        bw.f(fh.cdef_damping - 3, 2)
        bw.f(fh.cdef_bits, 2)
        for i in range(1 << fh.cdef_bits):
            bw.f(fh.cdef_y_pri_strength[i], 4)
            bw.f(fh.cdef_y_sec_strength[i], 2)
            bw.f(fh.cdef_uv_pri_strength[i], 4)
            bw.f(fh.cdef_uv_sec_strength[i], 2)
    # loop restoration
    if not (fh.all_lossless or fh.allow_intrabc) and seq.enable_restoration:
        for p in range(seq.num_planes):
            bw.f(fh.lr_type[p], 2)
        assert not any(fh.lr_type), "LR writing not implemented"
    # tx mode
    if not fh.coded_lossless:
        bw.f(int(fh.tx_mode == TX_MODE_SELECT), 1)
    bw.f(fh.reduced_tx_set, 1)
    if seq.film_grain_params_present and (fh.show_frame or fh.showable_frame):
        bw.f(fh.apply_grain, 1)
        assert not fh.apply_grain
    return bw


def write_frame_header_intra_only(
    seq: SequenceHeader, fh: FrameHeader, bw: BitWriter
) -> BitWriter:
    """Shown INTRA_ONLY frame refreshing slot 0 — keyframe tile syntax in a
    non-key TU (used to validate multi-TU reference management
    independently of the inter block syntax)."""
    assert fh.frame_type == INTRA_ONLY_FRAME and fh.show_frame
    bw.f(0, 1)  # show_existing_frame
    bw.f(INTRA_ONLY_FRAME, 2)
    bw.f(1, 1)  # show_frame
    bw.f(fh.error_resilient_mode, 1)
    bw.f(fh.disable_cdf_update, 1)
    if seq.seq_force_screen_content_tools == 2:
        bw.f(fh.allow_screen_content_tools, 1)
    bw.f(fh.frame_size_override, 1)
    assert not fh.frame_size_override
    # primary_ref_frame: intra -> implied NONE, no bits
    bw.f(fh.refresh_frame_flags, 8)
    assert fh.refresh_frame_flags != 0xFF
    if seq.enable_superres:
        bw.f(0, 1)
    bw.f(0, 1)  # render size same
    if fh.allow_screen_content_tools:
        bw.f(fh.allow_intrabc, 1)
    if not fh.disable_cdf_update:
        bw.f(fh.disable_frame_end_update_cdf, 1)
    _write_tile_info(bw, seq, fh)
    _write_quantization(bw, seq, fh)
    bw.f(0, 1)  # segmentation_enabled
    if fh.base_q_idx > 0:
        bw.f(fh.delta_q_present, 1)
    _compute_lossless(fh)
    if not (fh.coded_lossless or fh.allow_intrabc):
        l0, l1, l2, l3 = fh.loop_filter_level
        bw.f(l0, 6)
        bw.f(l1, 6)
        if seq.num_planes > 1 and (l0 or l1):
            bw.f(l2, 6)
            bw.f(l3, 6)
        bw.f(fh.loop_filter_sharpness, 3)
        bw.f(fh.loop_filter_delta_enabled, 1)
        if fh.loop_filter_delta_enabled:
            bw.f(0, 1)
    if not fh.coded_lossless:
        bw.f(int(fh.tx_mode == TX_MODE_SELECT), 1)
    bw.f(fh.reduced_tx_set, 1)
    return bw


def write_frame_header_inter(
    seq: SequenceHeader, fh: FrameHeader, bw: BitWriter
) -> BitWriter:
    """Write a shown INTER frame header for this encoder's operating point:
    no order hints, primary_ref_frame = NONE (per-frame CDF reset) or 0
    (LAST: CDFs carried from the previous frame's saved state), all
    seven ref slots -> slot 0 (LAST = previous frame), refresh slot 0,
    force_integer_mv = 0 with allow_high_precision_mv = 0 (the encoder
    restricts itself to quarter/full-pel MVs), non-switchable EIGHTTAP
    filter, single reference mode, global motion identity.

    Replaces the reference's reliance on SVT-AV1 for inter coding
    (reference crates/daemon/src/encode/av1an.rs:14 --keyint 240)."""
    assert fh.frame_type == INTER_FRAME and fh.show_frame
    assert not seq.enable_order_hint and not seq.enable_ref_frame_mvs
    bw.f(0, 1)  # show_existing_frame
    bw.f(INTER_FRAME, 2)
    bw.f(1, 1)  # show_frame (showable implied 1)
    bw.f(fh.error_resilient_mode, 1)
    assert not fh.error_resilient_mode
    bw.f(fh.disable_cdf_update, 1)
    if seq.seq_force_screen_content_tools == 2:
        bw.f(fh.allow_screen_content_tools, 1)
    assert not fh.allow_screen_content_tools  # force_integer_mv stays 0
    bw.f(fh.frame_size_override, 1)
    assert not fh.frame_size_override
    # PRIMARY_REF_NONE resets CDFs per frame; a real slot (production:
    # 0 = LAST) loads the previous frame's saved CDFs — the 5-15% entropy
    # tax of per-frame resets is what SVT's anchor never pays
    bw.f(fh.primary_ref_frame, 3)
    assert (fh.primary_ref_frame == PRIMARY_REF_NONE
            or fh.primary_ref_frame == 0)
    bw.f(fh.refresh_frame_flags, 8)
    assert fh.refresh_frame_flags != 0xFF
    for i in range(7):
        bw.f(fh.ref_frame_idx[i], 3)
    # frame_size(): no override -> max dims, no bits; render_size():
    if seq.enable_superres:
        bw.f(0, 1)
    bw.f(0, 1)  # render_and_frame_size_different
    bw.f(0, 1)  # allow_high_precision_mv (force_integer_mv == 0)
    bw.f(0, 1)  # is_filter_switchable = 0
    bw.f(0, 2)  # interpolation_filter = EIGHTTAP
    bw.f(0, 1)  # is_motion_mode_switchable
    # use_ref_frame_mvs: seq disables -> no bit
    if not fh.disable_cdf_update:
        bw.f(fh.disable_frame_end_update_cdf, 1)
    _write_tile_info(bw, seq, fh)
    _write_quantization(bw, seq, fh)
    bw.f(0, 1)  # segmentation_enabled
    if fh.base_q_idx > 0:
        bw.f(fh.delta_q_present, 1)
        assert not fh.delta_q_present
    _compute_lossless(fh)
    if not fh.coded_lossless:
        l0, l1, l2, l3 = fh.loop_filter_level
        bw.f(l0, 6)
        bw.f(l1, 6)
        if seq.num_planes > 1 and (l0 or l1):
            bw.f(l2, 6)
            bw.f(l3, 6)
        bw.f(fh.loop_filter_sharpness, 3)
        bw.f(fh.loop_filter_delta_enabled, 1)
        if fh.loop_filter_delta_enabled:
            bw.f(0, 1)  # no delta updates
    # cdef (same syntax as the key header)
    if not (fh.coded_lossless or fh.allow_intrabc) and seq.enable_cdef:
        bw.f(fh.cdef_damping - 3, 2)
        bw.f(fh.cdef_bits, 2)
        for i in range(1 << fh.cdef_bits):
            bw.f(fh.cdef_y_pri_strength[i], 4)
            bw.f(fh.cdef_y_sec_strength[i], 2)
            bw.f(fh.cdef_uv_pri_strength[i], 4)
            bw.f(fh.cdef_uv_sec_strength[i], 2)
    assert not seq.enable_restoration
    if not fh.coded_lossless:
        bw.f(int(fh.tx_mode == TX_MODE_SELECT), 1)
    bw.f(0, 1)  # reference_select = 0 (single reference mode)
    # skip_mode_present: not allowed without compound + order hints -> no bit
    # allow_warped_motion: seq disables -> no bit
    bw.f(fh.reduced_tx_set, 1)
    for _ in range(7):  # global motion per ref: is_global = 0 (IDENTITY)
        bw.f(0, 1)
    assert not seq.film_grain_params_present
    return bw


def _write_tile_info(bw: BitWriter, seq: SequenceHeader, fh: FrameHeader):
    t = fh.tiles
    sb_shift = 5 if seq.use_128x128_superblock else 4
    sb_cols = (fh.mi_cols + (1 << sb_shift) - 1) >> sb_shift
    sb_rows = (fh.mi_rows + (1 << sb_shift) - 1) >> sb_shift
    sb_size = sb_shift + 2
    max_tile_width_sb = 4096 >> sb_size
    max_tile_area_sb = (4096 * 2304) >> (2 * sb_size)
    min_log2_cols = tile_log2(max_tile_width_sb, sb_cols)
    max_log2_cols = tile_log2(1, min(sb_cols, 64))
    max_log2_rows = tile_log2(1, min(sb_rows, 64))
    min_log2_tiles = max(
        min_log2_cols, tile_log2(max_tile_area_sb, sb_rows * sb_cols)
    )
    assert t.uniform_spacing
    bw.f(1, 1)
    assert t.tile_cols_log2 >= min_log2_cols, "tile cols below minimum"
    for _ in range(t.tile_cols_log2 - min_log2_cols):
        bw.f(1, 1)
    if t.tile_cols_log2 < max_log2_cols:
        bw.f(0, 1)
    tile_width_sb = (sb_cols + (1 << t.tile_cols_log2) - 1) >> t.tile_cols_log2
    t.mi_col_starts = [
        min(i * (tile_width_sb << sb_shift), fh.mi_cols)
        for i in range(0, (sb_cols + tile_width_sb - 1) // tile_width_sb + 1)
    ]
    t.tile_cols = len(t.mi_col_starts) - 1
    min_log2_rows = max(min_log2_tiles - t.tile_cols_log2, 0)
    assert t.tile_rows_log2 >= min_log2_rows
    for _ in range(t.tile_rows_log2 - min_log2_rows):
        bw.f(1, 1)
    if t.tile_rows_log2 < max_log2_rows:
        bw.f(0, 1)
    tile_height_sb = (sb_rows + (1 << t.tile_rows_log2) - 1) >> t.tile_rows_log2
    t.mi_row_starts = [
        min(i * (tile_height_sb << sb_shift), fh.mi_rows)
        for i in range(0, (sb_rows + tile_height_sb - 1) // tile_height_sb + 1)
    ]
    t.tile_rows = len(t.mi_row_starts) - 1
    if t.tile_cols_log2 > 0 or t.tile_rows_log2 > 0:
        bw.f(t.context_update_tile_id, t.tile_rows_log2 + t.tile_cols_log2)
        bw.f(t.tile_size_bytes - 1, 2)


def _write_quantization(bw: BitWriter, seq: SequenceHeader, fh: FrameHeader):
    bw.f(fh.base_q_idx, 8)
    for dq in (fh.delta_q_y_dc,):
        bw.f(int(dq != 0), 1)
        if dq:
            bw.su(dq, 7)
    if seq.num_planes > 1:
        if seq.separate_uv_delta_q:
            bw.f(0, 1)
        for dq in (fh.delta_q_u_dc, fh.delta_q_u_ac):
            bw.f(int(dq != 0), 1)
            if dq:
                bw.su(dq, 7)
    bw.f(fh.using_qmatrix, 1)
    if fh.using_qmatrix:
        bw.f(fh.qm_y, 4)
        bw.f(fh.qm_u, 4)
        if seq.separate_uv_delta_q:
            bw.f(fh.qm_v, 4)
