// Native Wavefront OBJ loader: vertices + triangulated faces.
//
// Plays the role of an asset pipeline the reference lacks entirely (its
// scenes are procedural); production meshes for the BVH path load through
// this. Minimal but robust subset: v / f records, negative indices,
// polygon fan triangulation, v/vt/vn index forms. C ABI for ctypes.
//
//   int qtrt_obj_count(const char* path, int* num_verts, int* num_tris);
//   int qtrt_obj_load(const char* path, float* verts /*3V*/, int* faces /*3F*/);
// Both return 0 on success, negative on error.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> verts;
  std::vector<int32_t> faces;
};

// Parse one face vertex token ("7", "7/2", "7//3", "7/2/3"); returns the
// 0-based vertex index or -1.
int parse_face_index(const char* tok, int num_verts) {
  const long v = std::strtol(tok, nullptr, 10);
  if (v == 0) return -1;
  return v > 0 ? static_cast<int>(v - 1) : num_verts + static_cast<int>(v);
}

bool load(const char* path, ObjData* out) {
  FILE* f = std::fopen(path, "r");
  if (!f) return false;
  char line[4096];
  while (std::fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      float x, y, z;
      if (std::sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
        out->verts.push_back(x);
        out->verts.push_back(y);
        out->verts.push_back(z);
      }
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      const int nv = static_cast<int>(out->verts.size() / 3);
      std::vector<int> poly;
      char* save = nullptr;
      for (char* tok = strtok_r(line + 2, " \t\r\n", &save); tok;
           tok = strtok_r(nullptr, " \t\r\n", &save)) {
        const int idx = parse_face_index(tok, nv);
        if (idx >= 0 && idx < nv) poly.push_back(idx);
      }
      for (size_t k = 2; k < poly.size(); ++k) {  // fan triangulation
        out->faces.push_back(poly[0]);
        out->faces.push_back(poly[k - 1]);
        out->faces.push_back(poly[k]);
      }
    }
  }
  std::fclose(f);
  return true;
}

}  // namespace

extern "C" {

int qtrt_obj_count(const char* path, int32_t* num_verts, int32_t* num_tris) {
  ObjData d;
  if (!load(path, &d)) return -1;
  *num_verts = static_cast<int32_t>(d.verts.size() / 3);
  *num_tris = static_cast<int32_t>(d.faces.size() / 3);
  return 0;
}

int qtrt_obj_load(const char* path, float* verts, int32_t* faces) {
  ObjData d;
  if (!load(path, &d)) return -1;
  std::memcpy(verts, d.verts.data(), d.verts.size() * sizeof(float));
  std::memcpy(faces, d.faces.data(), d.faces.size() * sizeof(int32_t));
  return 0;
}

}  // extern "C"
