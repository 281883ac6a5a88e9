/*
 * av1_tool — encode/decode harness over the system codec libraries.
 *
 * Subcommands:
 *   encode <in.y4m> <out.ivf> [--codec libsvtav1|libaom-av1|librav1e]
 *          [--preset N] [--crf N] [--keyint N] [--threads N] [--params k=v,...]
 *          [--audio tone]
 *       Encodes and prints one JSON line with timing/size stats.  --audio
 *       tone adds a synthesized 440 Hz stereo PCM track (test fixtures for
 *       audio-preservation; container outputs only).
 *   decode <in> [out.y4m] [--codec libdav1d|libaom-av1|av1]
 *       Decodes; prints one JSON line with frame count, dims and a running
 *       MD5 over all decoded plane bytes (the cross-decoder recon oracle).
 *   mux <video_in> <streams_from|none> <out.mkv>
 *       Stream-copies the video from video_in (e.g. the TPU encoder's IVF)
 *       and every audio/subtitle stream from streams_from into out — the
 *       audio-preservation step the reference delegates to av1an's
 *       `--audio-params "-c:a copy"` (crates/daemon/src/encode/av1an.rs:96).
 *
 * Roles in the framework:
 *   - baseline anchor: SVT-AV1 preset-6 fps on this host (BASELINE.md; the
 *     reference daemon's encode settings live at reference
 *     crates/daemon/src/encode/av1an.rs:14).
 *   - decode oracle: validates that bitstreams produced by the TPU encoder
 *     are spec-conformant and reconstruct bit-exactly (dav1d and libaom must
 *     agree with the encoder's own reconstruction).
 */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/md5.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>

static double now_sec(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

static void die(const char *msg, int err) {
    char buf[256] = {0};
    if (err) av_strerror(err, buf, sizeof(buf));
    fprintf(stderr, "av1_tool: %s%s%s\n", msg, err ? ": " : "", buf);
    exit(1);
}

/* ------------------------------------------------------------------ */
/* decode                                                              */
/* ------------------------------------------------------------------ */

static int cmd_decode(int argc, char **argv) {
    const char *in = NULL, *out = NULL, *codec_name = "libdav1d";
    for (int i = 0; i < argc; i++) {
        if (!strcmp(argv[i], "--codec") && i + 1 < argc) codec_name = argv[++i];
        else if (!in) in = argv[i];
        else if (!out) out = argv[i];
    }
    if (!in) die("decode: missing input", 0);

    AVFormatContext *fmt = NULL;
    int err = avformat_open_input(&fmt, in, NULL, NULL);
    if (err < 0) die("open input", err);
    if ((err = avformat_find_stream_info(fmt, NULL)) < 0) die("stream info", err);
    int vidx = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, NULL, 0);
    if (vidx < 0) die("no video stream", vidx);

    const AVCodec *dec = avcodec_find_decoder_by_name(codec_name);
    if (!dec) dec = avcodec_find_decoder(fmt->streams[vidx]->codecpar->codec_id);
    if (!dec) die("no decoder", 0);
    AVCodecContext *ctx = avcodec_alloc_context3(dec);
    avcodec_parameters_to_context(ctx, fmt->streams[vidx]->codecpar);
    if ((err = avcodec_open2(ctx, dec, NULL)) < 0) die("open decoder", err);

    FILE *yf = NULL;
    struct AVMD5 *md5 = av_md5_alloc();
    av_md5_init(md5);

    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    long nframes = 0;
    int w = 0, h = 0, depth = 0;
    double t0 = now_sec();

    int draining = 0;
    while (1) {
        if (!draining) {
            err = av_read_frame(fmt, pkt);
            if (err == AVERROR_EOF) { draining = 1; avcodec_send_packet(ctx, NULL); }
            else if (err < 0) die("read packet", err);
            else {
                if (pkt->stream_index == vidx) {
                    if ((err = avcodec_send_packet(ctx, pkt)) < 0) die("send packet", err);
                }
                av_packet_unref(pkt);
            }
        }
        while (1) {
            err = avcodec_receive_frame(ctx, frame);
            if (err == AVERROR(EAGAIN)) break;
            if (err == AVERROR_EOF) goto done;
            if (err < 0) die("receive frame", err);

            const AVPixFmtDescriptor *desc = av_pix_fmt_desc_get(frame->format);
            depth = desc->comp[0].depth;
            w = frame->width; h = frame->height;
            int bytes = depth > 8 ? 2 : 1;
            if (out && !yf) {
                yf = fopen(out, "wb");
                if (!yf) die("open output", 0);
                fprintf(yf, "YUV4MPEG2 W%d H%d F30:1 Ip A1:1 C420%s\n", w, h,
                        depth == 10 ? "p10" : (depth == 12 ? "p12" : ""));
            }
            if (yf) fprintf(yf, "FRAME\n");
            for (int p = 0; p < 3; p++) {
                int pw = p ? (w + 1) / 2 : w, ph = p ? (h + 1) / 2 : h;
                for (int row = 0; row < ph; row++) {
                    const uint8_t *src = frame->data[p] + (size_t)row * frame->linesize[p];
                    av_md5_update(md5, src, (size_t)pw * bytes);
                    if (yf) fwrite(src, 1, (size_t)pw * bytes, yf);
                }
            }
            nframes++;
            av_frame_unref(frame);
        }
    }
done:;
    double dt = now_sec() - t0;
    uint8_t digest[16];
    av_md5_final(md5, digest);
    char hex[33];
    for (int i = 0; i < 16; i++) sprintf(hex + 2 * i, "%02x", digest[i]);
    printf("{\"frames\": %ld, \"width\": %d, \"height\": %d, \"bit_depth\": %d, "
           "\"md5\": \"%s\", \"decode_fps\": %.2f, \"decoder\": \"%s\"}\n",
           nframes, w, h, depth, hex, nframes / dt, dec->name);
    if (yf) fclose(yf);
    av_free(md5);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return 0;
}

/* ------------------------------------------------------------------ */
/* probe                                                               */
/* ------------------------------------------------------------------ */

/* Minimal ffprobe analog: one JSON line with per-stream type/codec and
 * container duration/size (the daemon has its own in-process probe in
 * native/daemon/probe.cpp; this is the standalone CLI surface). */
static int cmd_probe(int argc, char **argv) {
    if (argc < 1) die("probe: missing input", 0);
    AVFormatContext *fmt = NULL;
    int err = avformat_open_input(&fmt, argv[0], NULL, NULL);
    if (err < 0) die("open input", err);
    if ((err = avformat_find_stream_info(fmt, NULL)) < 0) die("stream info", err);
    printf("{\"streams\": [");
    for (unsigned i = 0; i < fmt->nb_streams; i++) {
        AVCodecParameters *par = fmt->streams[i]->codecpar;
        const char *type = av_get_media_type_string(par->codec_type);
        const char *codec = avcodec_get_name(par->codec_id);
        printf("%s{\"type\": \"%s\", \"codec\": \"%s\", \"width\": %d, "
               "\"height\": %d, \"sample_rate\": %d, \"channels\": %d}",
               i ? ", " : "", type ? type : "unknown", codec,
               par->width, par->height, par->sample_rate,
               par->ch_layout.nb_channels);
    }
    printf("], \"duration_secs\": %.3f, \"format\": \"%s\"}\n",
           fmt->duration > 0 ? fmt->duration / (double)AV_TIME_BASE : 0.0,
           fmt->iformat->name);
    avformat_close_input(&fmt);
    return 0;
}

/* ------------------------------------------------------------------ */
/* mux                                                                 */
/* ------------------------------------------------------------------ */

/* Pull the next wanted packet from a demuxer: video-only from the video
 * input, mapped streams from the streams input.  Returns 0 on EOF. */
static int next_mapped_packet(AVFormatContext *fmt, AVPacket *pkt,
                              const int *map) {
    while (1) {
        int err = av_read_frame(fmt, pkt);
        if (err == AVERROR_EOF) return 0;
        if (err < 0) die("read packet", err);
        if (map[pkt->stream_index] >= 0) return 1;
        av_packet_unref(pkt);
    }
}

static int cmd_mux(int argc, char **argv) {
    const char *vin = NULL, *sin = NULL, *out = NULL;
    for (int i = 0; i < argc; i++) {
        if (!vin) vin = argv[i];
        else if (!sin) sin = argv[i];
        else if (!out) out = argv[i];
    }
    if (!vin || !sin || !out) die("mux: need <video_in> <streams_from|none> <out>", 0);
    if (!strcmp(sin, "none")) sin = NULL;

    AVFormatContext *vfmt = NULL, *sfmt = NULL, *ofmt = NULL;
    int err = avformat_open_input(&vfmt, vin, NULL, NULL);
    if (err < 0) die("open video input", err);
    if ((err = avformat_find_stream_info(vfmt, NULL)) < 0) die("video stream info", err);
    int vidx = av_find_best_stream(vfmt, AVMEDIA_TYPE_VIDEO, -1, -1, NULL, 0);
    if (vidx < 0) die("no video stream in video input", vidx);

    if ((err = avformat_alloc_output_context2(&ofmt, NULL, NULL, out)) < 0)
        die("alloc output", err);

    /* stream 0: the new video */
    int *vmap = calloc(vfmt->nb_streams, sizeof(int));
    for (unsigned i = 0; i < vfmt->nb_streams; i++) vmap[i] = -1;
    AVStream *ovs = avformat_new_stream(ofmt, NULL);
    avcodec_parameters_copy(ovs->codecpar, vfmt->streams[vidx]->codecpar);
    ovs->codecpar->codec_tag = 0;
    ovs->time_base = vfmt->streams[vidx]->time_base;
    vmap[vidx] = 0;

    /* remaining streams: every audio/subtitle stream from the original,
     * metadata included (language tags etc.) */
    int *smap = NULL;
    long naudio = 0, nsub = 0;
    if (sin) {
        if ((err = avformat_open_input(&sfmt, sin, NULL, NULL)) < 0)
            die("open streams input", err);
        if ((err = avformat_find_stream_info(sfmt, NULL)) < 0)
            die("streams info", err);
        smap = calloc(sfmt->nb_streams, sizeof(int));
        for (unsigned i = 0; i < sfmt->nb_streams; i++) {
            AVStream *st = sfmt->streams[i];
            enum AVMediaType t = st->codecpar->codec_type;
            smap[i] = -1;
            if (t != AVMEDIA_TYPE_AUDIO && t != AVMEDIA_TYPE_SUBTITLE) continue;
            AVStream *os = avformat_new_stream(ofmt, NULL);
            avcodec_parameters_copy(os->codecpar, st->codecpar);
            os->codecpar->codec_tag = 0;
            os->time_base = st->time_base;
            av_dict_copy(&os->metadata, st->metadata, 0);
            smap[i] = os->index;
            if (t == AVMEDIA_TYPE_AUDIO) naudio++; else nsub++;
        }
    }

    if ((err = avio_open(&ofmt->pb, out, AVIO_FLAG_WRITE)) < 0) die("open out file", err);
    if ((err = avformat_write_header(ofmt, NULL)) < 0) die("write header", err);

    /* dts-ordered two-way merge so the output stays well interleaved */
    AVPacket *vp = av_packet_alloc(), *sp = av_packet_alloc();
    int have_v = next_mapped_packet(vfmt, vp, vmap);
    int have_s = sfmt ? next_mapped_packet(sfmt, sp, smap) : 0;
    long nvpkt = 0, nspkt = 0;
    while (have_v || have_s) {
        int take_v;
        if (have_v && have_s) {
            AVRational vtb = vfmt->streams[vp->stream_index]->time_base;
            AVRational stb = sfmt->streams[sp->stream_index]->time_base;
            int64_t vd = vp->dts == AV_NOPTS_VALUE ? vp->pts : vp->dts;
            int64_t sd = sp->dts == AV_NOPTS_VALUE ? sp->pts : sp->dts;
            take_v = av_compare_ts(vd, vtb, sd, stb) <= 0;
        } else {
            take_v = have_v;
        }
        AVPacket *pkt = take_v ? vp : sp;
        AVFormatContext *src = take_v ? vfmt : sfmt;
        const int *map = take_v ? vmap : smap;
        int oidx = map[pkt->stream_index];
        av_packet_rescale_ts(pkt, src->streams[pkt->stream_index]->time_base,
                             ofmt->streams[oidx]->time_base);
        pkt->stream_index = oidx;
        pkt->pos = -1;
        if ((err = av_interleaved_write_frame(ofmt, pkt)) < 0) die("write packet", err);
        if (take_v) { nvpkt++; have_v = next_mapped_packet(vfmt, vp, vmap); }
        else { nspkt++; have_s = next_mapped_packet(sfmt, sp, smap); }
    }
    av_write_trailer(ofmt);

    printf("{\"video_packets\": %ld, \"copied_packets\": %ld, "
           "\"audio_streams\": %ld, \"subtitle_streams\": %ld}\n",
           nvpkt, nspkt, naudio, nsub);

    av_packet_free(&vp);
    av_packet_free(&sp);
    avio_closep(&ofmt->pb);
    avformat_free_context(ofmt);
    avformat_close_input(&vfmt);
    if (sfmt) avformat_close_input(&sfmt);
    free(vmap);
    free(smap);
    return 0;
}

/* ------------------------------------------------------------------ */
/* encode                                                              */
/* ------------------------------------------------------------------ */

static int cmd_encode(int argc, char **argv) {
    const char *in = NULL, *out = NULL, *codec_name = "libsvtav1";
    const char *params = NULL, *audio = NULL;
    int preset = 6, crf = 30, keyint = 240, threads = 0;
    for (int i = 0; i < argc; i++) {
        if (!strcmp(argv[i], "--codec") && i + 1 < argc) codec_name = argv[++i];
        else if (!strcmp(argv[i], "--audio") && i + 1 < argc) audio = argv[++i];
        else if (!strcmp(argv[i], "--preset") && i + 1 < argc) preset = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--crf") && i + 1 < argc) crf = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--keyint") && i + 1 < argc) keyint = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--threads") && i + 1 < argc) threads = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--params") && i + 1 < argc) params = argv[++i];
        else if (!in) in = argv[i];
        else if (!out) out = argv[i];
    }
    if (!in || !out) die("encode: need input and output", 0);

    /* demux + decode y4m input */
    AVFormatContext *ifmt = NULL;
    int err = avformat_open_input(&ifmt, in, NULL, NULL);
    if (err < 0) die("open input", err);
    if ((err = avformat_find_stream_info(ifmt, NULL)) < 0) die("stream info", err);
    int vidx = av_find_best_stream(ifmt, AVMEDIA_TYPE_VIDEO, -1, -1, NULL, 0);
    const AVCodec *rawdec = avcodec_find_decoder(ifmt->streams[vidx]->codecpar->codec_id);
    AVCodecContext *rctx = avcodec_alloc_context3(rawdec);
    avcodec_parameters_to_context(rctx, ifmt->streams[vidx]->codecpar);
    if ((err = avcodec_open2(rctx, rawdec, NULL)) < 0) die("open raw decoder", err);

    const AVCodec *enc = avcodec_find_encoder_by_name(codec_name);
    if (!enc) die("encoder not found", 0);
    AVCodecContext *ectx = avcodec_alloc_context3(enc);
    ectx->width = rctx->width;
    ectx->height = rctx->height;
    ectx->pix_fmt = rctx->pix_fmt;
    ectx->time_base = (AVRational){1, 30};
    ectx->framerate = (AVRational){30, 1};
    ectx->gop_size = keyint;
    ectx->thread_count = threads;

    char v[32];
    if (!strcmp(codec_name, "libsvtav1")) {
        snprintf(v, sizeof(v), "%d", preset);
        av_opt_set(ectx->priv_data, "preset", v, 0);
        char sp[256];
        snprintf(sp, sizeof(sp), "crf=%d%s%s", crf, params ? ":" : "", params ? params : "");
        av_opt_set(ectx->priv_data, "svtav1-params", sp, 0);
    } else if (!strcmp(codec_name, "libaom-av1")) {
        snprintf(v, sizeof(v), "%d", preset);
        av_opt_set(ectx->priv_data, "cpu-used", v, 0);
        av_opt_set_int(ectx->priv_data, "crf", crf, 0);
        ectx->bit_rate = 0;
        if (params) av_opt_set(ectx->priv_data, "aom-params", params, 0);
    } else if (!strcmp(codec_name, "librav1e")) {
        snprintf(v, sizeof(v), "%d", preset);
        av_opt_set(ectx->priv_data, "speed", v, 0);
        av_opt_set_int(ectx->priv_data, "qp", crf * 4 > 255 ? 255 : crf * 4, 0);
        if (params) av_opt_set(ectx->priv_data, "rav1e-params", params, 0);
    }
    if ((err = avcodec_open2(ectx, enc, NULL)) < 0) die("open encoder", err);

    /* muxer: ivf for .ivf outputs, else guessed from the file extension
       (lets tests produce non-AV1 .mkv/.mp4 fixtures with e.g. mpeg4) */
    AVFormatContext *ofmt = NULL;
    const char *fmt_name = NULL;
    size_t olen = strlen(out);
    if (olen > 4 && !strcmp(out + olen - 4, ".ivf")) fmt_name = "ivf";
    if ((err = avformat_alloc_output_context2(&ofmt, NULL, fmt_name, out)) < 0)
        die("alloc output", err);
    AVStream *ost = avformat_new_stream(ofmt, NULL);
    avcodec_parameters_from_context(ost->codecpar, ectx);
    ost->codecpar->codec_tag = 0;
    ost->time_base = ectx->time_base;

    /* optional synthesized stereo PCM tone (audio-preservation fixtures) */
    AVCodecContext *actx = NULL;
    AVStream *ast = NULL;
    AVFrame *aframe = NULL;
    int64_t asamples = 0;
    if (audio && strcmp(audio, "tone") == 0 && !fmt_name) {
        const AVCodec *aenc = avcodec_find_encoder(AV_CODEC_ID_PCM_S16LE);
        actx = avcodec_alloc_context3(aenc);
        actx->sample_rate = 48000;
        actx->sample_fmt = AV_SAMPLE_FMT_S16;
        av_channel_layout_default(&actx->ch_layout, 2);
        actx->time_base = (AVRational){1, 48000};
        if ((err = avcodec_open2(actx, aenc, NULL)) < 0) die("open audio encoder", err);
        ast = avformat_new_stream(ofmt, NULL);
        avcodec_parameters_from_context(ast->codecpar, actx);
        ast->codecpar->codec_tag = 0;
        ast->time_base = actx->time_base;
        aframe = av_frame_alloc();
        aframe->format = AV_SAMPLE_FMT_S16;
        av_channel_layout_default(&aframe->ch_layout, 2);
        aframe->sample_rate = 48000;
        aframe->nb_samples = 1600;  /* one video frame at 30 fps */
        av_frame_get_buffer(aframe, 0);
    }
    if ((err = avio_open(&ofmt->pb, out, AVIO_FLAG_WRITE)) < 0) die("open out file", err);
    if ((err = avformat_write_header(ofmt, NULL)) < 0) die("write header", err);

    AVPacket *pkt = av_packet_alloc();
    AVPacket *opkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    long nin = 0, nout = 0;
    int64_t total_bytes = 0;
    double t0 = now_sec();

    int in_eof = 0;
    while (!in_eof) {
        err = av_read_frame(ifmt, pkt);
        if (err == AVERROR_EOF) { in_eof = 1; avcodec_send_packet(rctx, NULL); }
        else if (err < 0) die("read", err);
        else { avcodec_send_packet(rctx, pkt); av_packet_unref(pkt); }

        while (avcodec_receive_frame(rctx, frame) == 0) {
            frame->pts = nin++;
            if ((err = avcodec_send_frame(ectx, frame)) < 0) die("send frame", err);
            while (avcodec_receive_packet(ectx, opkt) == 0) {
                total_bytes += opkt->size;
                nout++;
                av_packet_rescale_ts(opkt, ectx->time_base, ost->time_base);
                av_interleaved_write_frame(ofmt, opkt);
            }
            if (actx) {  /* one video frame's worth of 440 Hz tone */
                av_frame_make_writable(aframe);
                int16_t *d = (int16_t *)aframe->data[0];
                for (int s = 0; s < aframe->nb_samples; s++) {
                    double t = (double)(asamples + s) / 48000.0;
                    int16_t v = (int16_t)(8000.0 * sin(2 * 3.14159265358979 * 440.0 * t));
                    d[2 * s] = v;
                    d[2 * s + 1] = v;
                }
                aframe->pts = asamples;
                asamples += aframe->nb_samples;
                avcodec_send_frame(actx, aframe);
                AVPacket *apkt = av_packet_alloc();
                while (avcodec_receive_packet(actx, apkt) == 0) {
                    apkt->stream_index = ast->index;
                    av_packet_rescale_ts(apkt, actx->time_base, ast->time_base);
                    av_interleaved_write_frame(ofmt, apkt);
                }
                av_packet_free(&apkt);
            }
            av_frame_unref(frame);
        }
    }
    avcodec_send_frame(ectx, NULL);
    while (avcodec_receive_packet(ectx, opkt) == 0) {
        total_bytes += opkt->size;
        nout++;
        av_packet_rescale_ts(opkt, ectx->time_base, ost->time_base);
        av_interleaved_write_frame(ofmt, opkt);
    }
    av_write_trailer(ofmt);
    double dt = now_sec() - t0;

    printf("{\"codec\": \"%s\", \"preset\": %d, \"crf\": %d, \"frames\": %ld, "
           "\"packets\": %ld, \"bytes\": %lld, \"encode_seconds\": %.3f, "
           "\"encode_fps\": %.3f, \"width\": %d, \"height\": %d}\n",
           codec_name, preset, crf, nin, nout, (long long)total_bytes, dt,
           nin / dt, ectx->width, ectx->height);

    avio_closep(&ofmt->pb);
    avformat_free_context(ofmt);
    av_packet_free(&pkt);
    av_packet_free(&opkt);
    av_frame_free(&frame);
    if (aframe) av_frame_free(&aframe);
    if (actx) avcodec_free_context(&actx);
    avcodec_free_context(&ectx);
    avcodec_free_context(&rctx);
    avformat_close_input(&ifmt);
    return 0;
}

int main(int argc, char **argv) {
    av_log_set_level(AV_LOG_ERROR);
    if (argc < 2) {
        fprintf(stderr,
                "usage: av1_tool encode <in.y4m> <out.ivf> [--codec C] [--preset N] "
                "[--crf N] [--keyint N] [--threads N] [--params P] [--audio tone]\n"
                "       av1_tool decode <in> [out.y4m] [--codec C]\n"
                "       av1_tool mux <video_in> <streams_from|none> <out.mkv>\n");
        return 2;
    }
    if (!strcmp(argv[1], "encode")) return cmd_encode(argc - 2, argv + 2);
    if (!strcmp(argv[1], "decode")) return cmd_decode(argc - 2, argv + 2);
    if (!strcmp(argv[1], "mux")) return cmd_mux(argc - 2, argv + 2);
    if (!strcmp(argv[1], "probe")) return cmd_probe(argc - 2, argv + 2);
    fprintf(stderr, "unknown subcommand %s\n", argv[1]);
    return 2;
}
