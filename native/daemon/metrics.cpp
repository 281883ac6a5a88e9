#include "metrics.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <fstream>
#include <sstream>
#include <thread>

#include "json.h"

namespace av1d {

std::string snapshot_to_json(const MetricsSnapshot &s) {
  auto j = Json::object();
  j->set("timestamp_unix_ms", Json::number((double)s.timestamp_unix_ms));
  auto jobs = Json::array();
  for (const auto &m : s.jobs) {
    auto o = Json::object();
    o->set("id", Json::string(m.id));
    o->set("input_path", Json::string(m.input_path));
    o->set("stage", Json::string(m.stage));
    o->set("progress", Json::number(m.progress));
    o->set("fps", Json::number(m.fps));
    o->set("bitrate_kbps", Json::number(m.bitrate_kbps));
    o->set("crf", Json::number(m.crf));
    o->set("encoder", Json::string(m.encoder));
    o->set("workers", Json::number(m.workers));
    o->set("est_remaining_secs", Json::number(m.est_remaining_secs));
    o->set("frames_encoded", Json::number((double)m.frames_encoded));
    o->set("total_frames", Json::number((double)m.total_frames));
    o->set("size_in_bytes_before", Json::number((double)m.size_in_bytes_before));
    o->set("size_in_bytes_after", Json::number((double)m.size_in_bytes_after));
    // "vmaf" stays in the schema for reference parity but is never
    // populated (the reference never fills it either, metrics.rs:27-29);
    // the actually-computed score ships under its honest name.
    o->set("vmaf", Json::null());
    o->set("tpu_vmaf", m.vmaf < 0 ? Json::null() : Json::number(m.vmaf));
    o->set("psnr", m.psnr < 0 ? Json::null() : Json::number(m.psnr));
    o->set("ssim", m.ssim < 0 ? Json::null() : Json::number(m.ssim));
    jobs->arr.push_back(o);
  }
  j->set("jobs", jobs);
  auto sys = Json::object();
  sys->set("cpu_usage_percent", Json::number(s.system.cpu_usage_percent));
  sys->set("mem_usage_percent", Json::number(s.system.mem_usage_percent));
  sys->set("load_avg_1", Json::number(s.system.load_avg_1));
  sys->set("load_avg_5", Json::number(s.system.load_avg_5));
  sys->set("load_avg_15", Json::number(s.system.load_avg_15));
  j->set("system", sys);
  j->set("queue_len", Json::number((double)s.queue_len));
  j->set("running_jobs", Json::number((double)s.running_jobs));
  j->set("completed_jobs", Json::number((double)s.completed_jobs));
  j->set("failed_jobs", Json::number((double)s.failed_jobs));
  j->set("total_bytes_encoded", Json::number((double)s.total_bytes_encoded));
  return j->dumps();
}

SystemMetrics SystemSampler::sample() {
  SystemMetrics m;
  // cpu: /proc/stat first line "cpu user nice system idle iowait irq ..."
  {
    std::ifstream f("/proc/stat");
    std::string cpu;
    uint64_t v[8] = {0};
    if (f >> cpu && cpu == "cpu") {
      uint64_t total = 0, idle = 0;
      for (int i = 0; i < 8 && (f >> v[i]); i++) total += v[i];
      idle = v[3] + v[4];
      if (last_total_ && total > last_total_) {
        uint64_t dt = total - last_total_, di = idle - last_idle_;
        m.cpu_usage_percent = dt ? 100.0 * (double)(dt - di) / (double)dt : 0;
      }
      last_total_ = total;
      last_idle_ = idle;
    }
  }
  // memory: /proc/meminfo MemTotal / MemAvailable
  {
    std::ifstream f("/proc/meminfo");
    std::string k;
    uint64_t total = 0, avail = 0, val;
    std::string unit;
    while (f >> k >> val) {
      std::getline(f, unit);
      if (k == "MemTotal:") total = val;
      else if (k == "MemAvailable:") avail = val;
      if (total && avail) break;
    }
    if (total)
      m.mem_usage_percent = 100.0 * (double)(total - avail) / (double)total;
  }
  // load averages
  {
    std::ifstream f("/proc/loadavg");
    f >> m.load_avg_1 >> m.load_avg_5 >> m.load_avg_15;
  }
  return m;
}

MetricsServer::MetricsServer(SharedMetrics *metrics,
                             const std::string &bind_addr, int port)
    : metrics_(metrics), addr_(bind_addr), port_(port) {}

MetricsServer::~MetricsServer() { stop(); }

bool MetricsServer::start(std::string *err) {
  listen_fd_ = socket(AF_INET, SOCK_STREAM, 0);
  if (listen_fd_ < 0) {
    if (err) *err = "socket() failed";
    return false;
  }
  int one = 1;
  setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
  sockaddr_in sa{};
  sa.sin_family = AF_INET;
  sa.sin_port = htons((uint16_t)port_);
  inet_pton(AF_INET, addr_.c_str(), &sa.sin_addr);
  if (bind(listen_fd_, (sockaddr *)&sa, sizeof sa) < 0 ||
      listen(listen_fd_, 16) < 0) {
    if (err) *err = "bind/listen on " + addr_ + ":" + std::to_string(port_) +
                    " failed: " + strerror(errno);
    close(listen_fd_);
    listen_fd_ = -1;
    return false;
  }
  if (port_ == 0) {  // ephemeral: discover the actual port
    socklen_t len = sizeof sa;
    getsockname(listen_fd_, (sockaddr *)&sa, &len);
    port_ = ntohs(sa.sin_port);
  }
  running_ = true;
  thread_ = new std::thread([this] { serve_loop(); });
  return true;
}

void MetricsServer::stop() {
  if (!running_) return;
  running_ = false;
  shutdown(listen_fd_, SHUT_RDWR);
  close(listen_fd_);
  auto *t = (std::thread *)thread_;
  if (t) {
    t->join();
    delete t;
    thread_ = nullptr;
  }
  listen_fd_ = -1;
}

void MetricsServer::serve_loop() {
  while (running_) {
    int fd = accept(listen_fd_, nullptr, nullptr);
    if (fd < 0) {
      if (!running_) break;
      continue;
    }
    char buf[4096];
    ssize_t n = recv(fd, buf, sizeof buf - 1, 0);
    std::string resp;
    if (n > 0) {
      buf[n] = 0;
      std::string req(buf);
      bool is_metrics = req.rfind("GET /metrics", 0) == 0;
      if (is_metrics) {
        std::string body = snapshot_to_json(metrics_->get());
        resp = "HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n"
               "Content-Length: " + std::to_string(body.size()) +
               "\r\nConnection: close\r\n\r\n" + body;
      } else {
        resp = "HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n"
               "Connection: close\r\n\r\n";
      }
      send(fd, resp.data(), resp.size(), MSG_NOSIGNAL);
    }
    close(fd);
  }
}

}  // namespace av1d
