#include "probe.h"

#include <algorithm>
#include <filesystem>

extern "C" {
#include <libavformat/avformat.h>
}

namespace av1d {

bool probe_file(const std::string &path, ProbeResult *out, std::string *err) {
  AVFormatContext *ctx = nullptr;
  if (avformat_open_input(&ctx, path.c_str(), nullptr, nullptr) < 0) {
    if (err) *err = "cannot open " + path;
    return false;
  }
  if (avformat_find_stream_info(ctx, nullptr) < 0) {
    avformat_close_input(&ctx);
    if (err) *err = "cannot read stream info from " + path;
    return false;
  }
  out->video_streams.clear();
  out->audio_streams.clear();
  for (unsigned i = 0; i < ctx->nb_streams; i++) {
    AVCodecParameters *par = ctx->streams[i]->codecpar;
    const char *name = avcodec_get_name(par->codec_id);
    if (par->codec_type == AVMEDIA_TYPE_VIDEO) {
      // attached cover art is flagged as a picture, not a video stream
      if (ctx->streams[i]->disposition & AV_DISPOSITION_ATTACHED_PIC) continue;
      VideoStream vs;
      vs.codec = name ? name : "";
      vs.width = par->width;
      vs.height = par->height;
      vs.bitrate_kbps = par->bit_rate > 0 ? par->bit_rate / 1000.0 : 0;
      out->video_streams.push_back(std::move(vs));
    } else if (par->codec_type == AVMEDIA_TYPE_AUDIO) {
      AudioStream as;
      as.codec = name ? name : "";
      out->audio_streams.push_back(std::move(as));
    }
  }
  out->format.duration_secs =
      ctx->duration > 0 ? ctx->duration / (double)AV_TIME_BASE : 0;
  out->format.container = ctx->iformat && ctx->iformat->name
                              ? ctx->iformat->name : "";
  std::error_code ec;
  out->format.size_bytes = std::filesystem::file_size(path, ec);
  if (ec) out->format.size_bytes = 0;
  // overall bitrate fallback for streams without a per-stream rate
  if (!out->video_streams.empty() && out->video_streams[0].bitrate_kbps == 0 &&
      ctx->bit_rate > 0)
    out->video_streams[0].bitrate_kbps = ctx->bit_rate / 1000.0;
  avformat_close_input(&ctx);
  return true;
}

static std::string lower(std::string s) {
  std::transform(s.begin(), s.end(), s.begin(),
                 [](unsigned char c) { return (char)tolower(c); });
  return s;
}

GateResult check_gates(const ProbeResult &probe, uint64_t min_bytes) {
  if (probe.video_streams.empty())
    return {false, "no video streams found"};
  if (probe.format.size_bytes < min_bytes)
    return {false, "file below minimum size (" +
                       std::to_string(probe.format.size_bytes) + " < " +
                       std::to_string(min_bytes) + " bytes)"};
  if (lower(probe.video_streams[0].codec).find("av1") != std::string::npos)
    return {false, "already AV1 encoded"};
  return {true, ""};
}

const char *source_type_name(SourceType t) {
  switch (t) {
    case SourceType::WebLike: return "web-like";
    case SourceType::DiscLike: return "disc-like";
    default: return "unknown";
  }
}

// keyword lists per reference classify.rs:41-54
static const char *kWebKeywords[] = {
    "webrip", "web-rip", "webdl", "web-dl", "web.dl", "web.rip",
    "amzn", "amazon", "nf", "netflix", "hulu", "dsnp", "disney",
    "atvp", "appletv", "hmax", "hbo", "pcok", "peacock",
    "pmtp", "paramount", "stan", "it", "hdtv", "pdtv",
    "webhd", "web", "streaming"};
static const char *kDiscKeywords[] = {
    "bluray", "blu-ray", "bdrip", "bd-rip", "brrip", "br-rip",
    "remux", "bdremux", "bd.remux", "dvdrip", "dvd-rip", "dvd",
    "uhd", "ultrahd", "4k.uhd", "hddvd", "hd-dvd"};

constexpr double kBitrateThresholdKbpsPerMp = 6000.0;

SourceType classify_source(const std::string &path,
                           const ProbeResult &probe) {
  std::string p = lower(path);
  for (const char *k : kWebKeywords)
    if (p.find(k) != std::string::npos) return SourceType::WebLike;
  for (const char *k : kDiscKeywords)
    if (p.find(k) != std::string::npos) return SourceType::DiscLike;
  return classify_by_bitrate_ratio(probe);
}

SourceType classify_by_bitrate_ratio(const ProbeResult &probe) {
  if (probe.video_streams.empty()) return SourceType::Unknown;
  const VideoStream &vs = probe.video_streams[0];
  if (vs.bitrate_kbps <= 0 || vs.width <= 0 || vs.height <= 0)
    return SourceType::Unknown;
  double mp = vs.width * (double)vs.height / 1e6;
  if (mp <= 0) return SourceType::Unknown;
  return vs.bitrate_kbps / mp < kBitrateThresholdKbpsPerMp
             ? SourceType::WebLike : SourceType::DiscLike;
}

}  // namespace av1d
