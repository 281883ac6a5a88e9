#include "replace.h"

#include <chrono>
#include <filesystem>

namespace fs = std::filesystem;

namespace av1d {

SizeGateResult check_size_gate(uint64_t original_bytes, uint64_t output_bytes,
                               double max_ratio) {
  SizeGateResult r;
  r.original_bytes = original_bytes;
  r.output_bytes = output_bytes;
  r.ratio = original_bytes ? (double)output_bytes / (double)original_bytes
                           : 0.0;
  // reject iff output >= original * max_ratio (reference size_gate.rs:29-46)
  r.accepted = original_bytes > 0 &&
               (double)output_bytes < (double)original_bytes * max_ratio;
  return r;
}

std::string backup_path(const std::string &original, int64_t unix_secs) {
  return original + ".orig." + std::to_string(unix_secs);
}

static bool move_file(const fs::path &from, const fs::path &to,
                      std::string *err) {
  std::error_code ec;
  fs::rename(from, to, ec);
  if (!ec) return true;
  // cross-filesystem fallback: copy then delete
  fs::copy_file(from, to, fs::copy_options::overwrite_existing, ec);
  if (ec) {
    if (err) *err = "backup copy failed: " + ec.message();
    return false;
  }
  fs::remove(from, ec);
  return true;
}

bool atomic_replace(const std::string &original, const std::string &encoded,
                    bool keep_original, std::string *final_path,
                    std::string *err) {
  std::error_code ec;
  int64_t secs = std::chrono::duration_cast<std::chrono::seconds>(
                     std::chrono::system_clock::now().time_since_epoch())
                     .count();
  fs::path orig(original), enc(encoded);
  fs::path backup(backup_path(original, secs));
  fs::path target = orig;
  target.replace_extension(enc.extension());

  if (!move_file(orig, backup, err)) return false;

  fs::copy_file(enc, target, fs::copy_options::overwrite_existing, ec);
  if (ec) {
    // restore the backup; the original must never be lost
    std::string rerr;
    move_file(backup, orig, &rerr);
    if (err) *err = "copy of encoded output failed: " + ec.message() +
                    (rerr.empty() ? "" : "; restore also failed: " + rerr);
    return false;
  }
  if (final_path) *final_path = target.string();
  if (!keep_original) fs::remove(backup, ec);
  return true;
}

}  // namespace av1d
