#include "encoder.h"

#include <errno.h>
#include <poll.h>
#include <signal.h>
#include <sys/wait.h>
#include <time.h>
#include <unistd.h>

#include <algorithm>
#include <cstdio>
#include <cstdlib>

#include "json.h"

namespace av1d {

static double now_monotonic() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}

std::string default_encode_cmd() {
  return "python3 -m av1tpu.cli encode -i {input} -o {output} "
         "--qindex {qindex} --workers {workers}";
}

static std::string shell_quote(const std::string &s) {
  std::string out = "'";
  for (char c : s) {
    if (c == '\'') out += "'\\''";
    else out += c;
  }
  out += "'";
  return out;
}

std::string build_encode_command(const std::string &tmpl,
                                 const EncodeParams &p) {
  std::string t = tmpl.empty() ? default_encode_cmd() : tmpl;
  auto sub = [&](const std::string &key, const std::string &val) {
    size_t pos;
    while ((pos = t.find(key)) != std::string::npos)
      t.replace(pos, key.size(), val);
  };
  sub("{input}", shell_quote(p.input_path));
  sub("{output}", shell_quote(p.output_path));
  sub("{temp}", shell_quote(p.temp_dir));
  sub("{qindex}", std::to_string(p.qindex));
  sub("{workers}", std::to_string(p.workers));
  return t;
}

bool command_has_hardware_flags(const std::string &cmd, std::string *flag) {
  static const char *kForbidden[] = {"nvenc", "qsv", "vaapi", "cuda",
                                     "amf", "vce", "qsvenc"};
  std::string low = cmd;
  std::transform(low.begin(), low.end(), low.begin(),
                 [](unsigned char c) { return (char)tolower(c); });
  for (const char *f : kForbidden)
    if (low.find(f) != std::string::npos) {
      if (flag) *flag = f;
      return true;
    }
  return false;
}

// Parse one stdout line: progress event, stats record, or neither.
static void handle_line(const std::string &line,
                        std::string *last_stats_line,
                        const ProgressFn &on_progress) {
  if (line.empty() || line[0] != '{') return;
  bool ok = false;
  JsonPtr j = Json::parse(line, &ok);
  if (!ok || !j || j->type != Json::OBJ) return;
  if (auto p = j->get("progress")) {
    if (on_progress) {
      EncodeProgress ev;
      ev.progress = p->as_num();
      if (auto v = j->get("frames_encoded"))
        ev.frames_encoded = (uint64_t)v->as_num();
      if (auto v = j->get("total_frames"))
        ev.total_frames = (uint64_t)v->as_num();
      if (auto v = j->get("fps")) ev.fps = v->as_num();
      on_progress(ev);
    }
    return;
  }
  *last_stats_line = line;
}

EncodeResult run_encode(const std::string &cmd, int timeout_secs,
                        const ProgressFn &on_progress) {
  EncodeResult r;
  int pipefd[2];
  if (pipe(pipefd) != 0) {
    r.error = "failed to create encoder pipe";
    return r;
  }
  pid_t pid = fork();
  if (pid < 0) {
    close(pipefd[0]);
    close(pipefd[1]);
    r.error = "failed to spawn encoder";
    return r;
  }
  if (pid == 0) {
    // child: own process group so a timeout can kill the whole backend
    // tree (python + any helpers), not just the shell
    setpgid(0, 0);
    dup2(pipefd[1], STDOUT_FILENO);
    close(pipefd[0]);
    close(pipefd[1]);
    execl("/bin/sh", "sh", "-c", cmd.c_str(), (char *)nullptr);
    _exit(127);
  }
  setpgid(pid, pid);  // also from the parent (race-free either way)
  close(pipefd[1]);

  std::string pending, last_stats;
  char buf[4096];
  const double deadline =
      timeout_secs > 0 ? now_monotonic() + timeout_secs : 0;
  bool timed_out = false;
  for (;;) {
    struct pollfd pfd = {pipefd[0], POLLIN, 0};
    int pr = poll(&pfd, 1, 500);
    if (pr > 0) {
      ssize_t n = read(pipefd[0], buf, sizeof buf);
      if (n < 0 && errno == EINTR) continue;
      if (n <= 0) break;  // EOF (or error): encoder closed stdout
      pending.append(buf, (size_t)n);
      size_t nl;
      while ((nl = pending.find('\n')) != std::string::npos) {
        std::string line = pending.substr(0, nl);
        if (!line.empty() && line.back() == '\r') line.pop_back();
        pending.erase(0, nl + 1);
        handle_line(line, &last_stats, on_progress);
      }
    }
    if (deadline > 0 && now_monotonic() > deadline) {
      timed_out = true;
      kill(-pid, SIGKILL);
      break;
    }
  }
  close(pipefd[0]);
  if (!pending.empty()) handle_line(pending, &last_stats, on_progress);

  // the deadline stays armed after stdout EOF: an encoder that closes its
  // pipe but never exits must still be killed (ADVICE r2)
  int status = 0;
  for (;;) {
    pid_t w = waitpid(pid, &status, timed_out ? 0 : WNOHANG);
    if (w == pid) break;
    if (w < 0) {
      if (errno == EINTR) continue;
      break;  // no such child (already reaped?)
    }
    if (deadline > 0 && now_monotonic() > deadline) {
      timed_out = true;
      kill(-pid, SIGKILL);
      continue;  // blocking reap after the kill
    }
    usleep(100 * 1000);
  }
  if (timed_out) {
    r.error = "encoder timed out after " + std::to_string(timeout_secs) +
              "s (process group killed)";
    return r;
  }
  if (WIFSIGNALED(status)) {
    r.error = "encoder terminated abnormally (signal " +
              std::to_string(WTERMSIG(status)) + ")";
    return r;
  }
  r.exit_code = WIFEXITED(status) ? WEXITSTATUS(status) : -1;
  if (r.exit_code != 0) {
    r.error = "encoder exited with status " + std::to_string(r.exit_code);
    return r;
  }
  if (!last_stats.empty()) {
    bool ok = false;
    JsonPtr j = Json::parse(last_stats, &ok);
    if (ok && j && j->type == Json::OBJ) {
      if (auto v = j->get("psnr_y")) r.psnr_y = v->as_num();
      if (auto v = j->get("tpu_vmaf")) r.vmaf = v->as_num();
      if (auto v = j->get("encode_fps")) r.encode_fps = v->as_num();
      if (auto v = j->get("frames")) r.frames = (int64_t)v->as_num();
    }
  }
  r.ok = true;
  return r;
}

}  // namespace av1d
