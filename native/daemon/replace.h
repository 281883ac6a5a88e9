// Size gate + atomic in-place replacement.
// Mirrors size_gate.rs:29-46 (reject iff output >= original * ratio) and
// replace.rs:55-127 (backup-rename with cross-filesystem copy fallback,
// restore on failure, delete backup unless keep_original).
#pragma once

#include <cstdint>
#include <string>

namespace av1d {

struct SizeGateResult {
  bool accepted = false;
  uint64_t original_bytes = 0;
  uint64_t output_bytes = 0;
  double ratio = 0;  // output / original
};

SizeGateResult check_size_gate(uint64_t original_bytes, uint64_t output_bytes,
                               double max_ratio);

// <original>.orig.<unix_secs>
std::string backup_path(const std::string &original, int64_t unix_secs);

// Replace `original` with `encoded`:
//   1. rename original -> backup (copy+delete fallback across filesystems)
//   2. copy encoded into the original's place (with the encoded extension
//      swapped in: video-only .ivf output keeps its extension)
//   3. on copy failure: restore the backup, report error
//   4. delete backup unless keep_original
// `final_path` receives the path the encoded file landed at.
bool atomic_replace(const std::string &original, const std::string &encoded,
                    bool keep_original, std::string *final_path,
                    std::string *err);

}  // namespace av1d
