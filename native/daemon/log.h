// Structured logging: timestamped, leveled, component-tagged lines on
// stderr.  The reference has no logging discipline at all (bare println!,
// SURVEY §5 "Tracing/profiling: none"); this is the rebuild's first-class
// replacement.  Level from AV1TPU_LOG_LEVEL (debug|info|warn|error,
// default info).  Format:
//   2026-08-16T20:01:02.123Z INFO  [executor] job 42 complete (8.1s)
#pragma once

#include <cstdarg>

namespace av1d {

enum class LogLevel { Debug = 0, Info = 1, Warn = 2, Error = 3 };

// minimum level emitted (initialized from AV1TPU_LOG_LEVEL on first use)
LogLevel log_threshold();

void log_at(LogLevel lvl, const char *component, const char *fmt, ...)
    __attribute__((format(printf, 3, 4)));

#define LOG_DEBUG(comp, ...) ::av1d::log_at(::av1d::LogLevel::Debug, comp, __VA_ARGS__)
#define LOG_INFO(comp, ...) ::av1d::log_at(::av1d::LogLevel::Info, comp, __VA_ARGS__)
#define LOG_WARN(comp, ...) ::av1d::log_at(::av1d::LogLevel::Warn, comp, __VA_ARGS__)
#define LOG_ERROR(comp, ...) ::av1d::log_at(::av1d::LogLevel::Error, comp, __VA_ARGS__)

}  // namespace av1d
