// Minimal JSON reader/writer for the daemon's job store and metrics
// endpoint.  Covers the subset the daemon emits/consumes: objects, arrays,
// strings, numbers, bools, null.  Mirrors the role serde_json plays in the
// reference (crates/daemon/src/jobs.rs, metrics.rs).
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

namespace av1d {

class Json;
using JsonPtr = std::shared_ptr<Json>;

class Json {
 public:
  enum Type { NUL, BOOL, NUM, STR, ARR, OBJ };
  Type type = NUL;
  bool b = false;
  double num = 0;
  std::string str;
  std::vector<JsonPtr> arr;
  std::vector<std::pair<std::string, JsonPtr>> obj;  // ordered

  static JsonPtr null() { return std::make_shared<Json>(); }
  static JsonPtr boolean(bool v) {
    auto j = std::make_shared<Json>(); j->type = BOOL; j->b = v; return j;
  }
  static JsonPtr number(double v) {
    auto j = std::make_shared<Json>(); j->type = NUM; j->num = v; return j;
  }
  static JsonPtr string(const std::string &v) {
    auto j = std::make_shared<Json>(); j->type = STR; j->str = v; return j;
  }
  static JsonPtr array() {
    auto j = std::make_shared<Json>(); j->type = ARR; return j;
  }
  static JsonPtr object() {
    auto j = std::make_shared<Json>(); j->type = OBJ; return j;
  }

  void set(const std::string &k, JsonPtr v) {
    for (auto &kv : obj)
      if (kv.first == k) { kv.second = v; return; }
    obj.emplace_back(k, v);
  }
  JsonPtr get(const std::string &k) const {
    for (auto &kv : obj)
      if (kv.first == k) return kv.second;
    return nullptr;
  }
  bool has(const std::string &k) const { return get(k) != nullptr; }
  int64_t as_int(int64_t dflt = 0) const {
    return type == NUM ? (int64_t)num : dflt;
  }
  double as_num(double dflt = 0) const { return type == NUM ? num : dflt; }
  std::string as_str(const std::string &dflt = "") const {
    return type == STR ? str : dflt;
  }
  bool as_bool(bool dflt = false) const { return type == BOOL ? b : dflt; }

  // ---- serialization ----
  static void escape(const std::string &s, std::string &out) {
    out += '"';
    for (char c : s) {
      switch (c) {
        case '"': out += "\\\""; break;
        case '\\': out += "\\\\"; break;
        case '\n': out += "\\n"; break;
        case '\r': out += "\\r"; break;
        case '\t': out += "\\t"; break;
        default:
          if ((unsigned char)c < 0x20) {
            char buf[8];
            snprintf(buf, sizeof buf, "\\u%04x", c);
            out += buf;
          } else {
            out += c;
          }
      }
    }
    out += '"';
  }

  void dump(std::string &out, int indent = 0, int depth = 0) const {
    auto pad = [&](int d) {
      if (indent) { out += '\n'; out.append((size_t)indent * d, ' '); }
    };
    switch (type) {
      case NUL: out += "null"; break;
      case BOOL: out += b ? "true" : "false"; break;
      case NUM: {
        char buf[32];
        if (num == (int64_t)num &&
            num >= -9.2e18 && num <= 9.2e18)
          snprintf(buf, sizeof buf, "%lld", (long long)num);
        else
          snprintf(buf, sizeof buf, "%.17g", num);
        out += buf;
        break;
      }
      case STR: escape(str, out); break;
      case ARR:
        out += '[';
        for (size_t i = 0; i < arr.size(); i++) {
          if (i) out += ',';
          pad(depth + 1);
          arr[i]->dump(out, indent, depth + 1);
        }
        if (!arr.empty()) pad(depth);
        out += ']';
        break;
      case OBJ:
        out += '{';
        for (size_t i = 0; i < obj.size(); i++) {
          if (i) out += ',';
          pad(depth + 1);
          escape(obj[i].first, out);
          out += indent ? ": " : ":";
          obj[i].second->dump(out, indent, depth + 1);
        }
        if (!obj.empty()) pad(depth);
        out += '}';
        break;
    }
  }
  std::string dumps(int indent = 0) const {
    std::string s;
    dump(s, indent);
    return s;
  }

  // ---- parsing ----
  struct Parser {
    const char *p, *end;
    bool ok = true;
    void ws() { while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++; }
    bool lit(const char *s) {
      size_t n = strlen(s);
      if ((size_t)(end - p) >= n && !strncmp(p, s, n)) { p += n; return true; }
      return false;
    }
    JsonPtr value() {
      ws();
      if (p >= end) { ok = false; return Json::null(); }
      if (*p == '{') return object();
      if (*p == '[') return array();
      if (*p == '"') return Json::string(string_());
      if (lit("true")) return Json::boolean(true);
      if (lit("false")) return Json::boolean(false);
      if (lit("null")) return Json::null();
      return number_();
    }
    std::string string_() {
      std::string s;
      p++;  // opening quote
      while (p < end && *p != '"') {
        if (*p == '\\' && p + 1 < end) {
          p++;
          switch (*p) {
            case 'n': s += '\n'; break;
            case 'r': s += '\r'; break;
            case 't': s += '\t'; break;
            case 'u':
              if (end - p >= 5) {
                int cp = (int)strtol(std::string(p + 1, p + 5).c_str(), nullptr, 16);
                // BMP only; encode UTF-8
                if (cp < 0x80) s += (char)cp;
                else if (cp < 0x800) {
                  s += (char)(0xC0 | (cp >> 6)); s += (char)(0x80 | (cp & 63));
                } else {
                  s += (char)(0xE0 | (cp >> 12));
                  s += (char)(0x80 | ((cp >> 6) & 63));
                  s += (char)(0x80 | (cp & 63));
                }
                p += 4;
              }
              break;
            default: s += *p;
          }
        } else {
          s += *p;
        }
        p++;
      }
      if (p < end) p++;  // closing quote
      else ok = false;
      return s;
    }
    JsonPtr number_() {
      char *e = nullptr;
      double v = strtod(p, &e);
      if (e == p) { ok = false; return Json::null(); }
      p = e;
      return Json::number(v);
    }
    JsonPtr array() {
      auto j = Json::array();
      p++;
      ws();
      if (p < end && *p == ']') { p++; return j; }
      while (ok && p < end) {
        j->arr.push_back(value());
        ws();
        if (p < end && *p == ',') { p++; continue; }
        if (p < end && *p == ']') { p++; return j; }
        break;
      }
      ok = false;
      return j;
    }
    JsonPtr object() {
      auto j = Json::object();
      p++;
      ws();
      if (p < end && *p == '}') { p++; return j; }
      while (ok && p < end) {
        ws();
        if (p >= end || *p != '"') break;
        std::string k = string_();
        ws();
        if (p >= end || *p != ':') break;
        p++;
        j->set(k, value());
        ws();
        if (p < end && *p == ',') { p++; continue; }
        if (p < end && *p == '}') { p++; return j; }
        break;
      }
      ok = false;
      return j;
    }
  };

  static JsonPtr parse(const std::string &s, bool *ok = nullptr) {
    Parser pr{s.data(), s.data() + s.size()};
    JsonPtr j = pr.value();
    pr.ws();
    bool good = pr.ok && pr.p == pr.end;
    if (ok) *ok = good;
    return good ? j : nullptr;
  }
};

}  // namespace av1d
