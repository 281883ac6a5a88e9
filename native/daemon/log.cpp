#include "log.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <mutex>
#include <sys/time.h>

namespace av1d {

static LogLevel parse_level() {
  const char *v = getenv("AV1TPU_LOG_LEVEL");
  if (!v) return LogLevel::Info;
  if (!strcasecmp(v, "debug")) return LogLevel::Debug;
  if (!strcasecmp(v, "warn") || !strcasecmp(v, "warning"))
    return LogLevel::Warn;
  if (!strcasecmp(v, "error")) return LogLevel::Error;
  return LogLevel::Info;
}

LogLevel log_threshold() {
  static LogLevel lvl = parse_level();
  return lvl;
}

static const char *level_name(LogLevel l) {
  switch (l) {
    case LogLevel::Debug: return "DEBUG";
    case LogLevel::Info: return "INFO ";
    case LogLevel::Warn: return "WARN ";
    case LogLevel::Error: return "ERROR";
  }
  return "?????";
}

void log_at(LogLevel lvl, const char *component, const char *fmt, ...) {
  if (lvl < log_threshold()) return;
  struct timeval tv;
  gettimeofday(&tv, nullptr);
  struct tm tm;
  gmtime_r(&tv.tv_sec, &tm);
  char ts[40];
  snprintf(ts, sizeof ts, "%04d-%02d-%02dT%02d:%02d:%02d.%03dZ",
           tm.tm_year + 1900, tm.tm_mon + 1, tm.tm_mday, tm.tm_hour,
           tm.tm_min, tm.tm_sec, (int)(tv.tv_usec / 1000));
  char msg[1024];
  va_list ap;
  va_start(ap, fmt);
  vsnprintf(msg, sizeof msg, fmt, ap);
  va_end(ap);
  // one fprintf per line: atomic enough for stderr line interleaving
  static std::mutex mu;
  std::lock_guard<std::mutex> l(mu);
  fprintf(stderr, "%s %s [%s] %s\n", ts, level_name(lvl), component, msg);
}

}  // namespace av1d
