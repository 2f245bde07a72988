"""NumPy transliteration of the reference serial renderer — the golden oracle.

This mirrors the *recursive* structure of ``World::shade_ray``
(Serial/world.cpp:32-111) in float64 NumPy, per pixel, vectorized only over
primitives within a single ray query. The TPU wavefront renderer must match
this oracle (the same role the serial stack plays for the CUDA stack in the
reference — its shader is carried as the spec comment in
Parellel/kernel.cu:266-347).

Semantics note: where the reference has documented defects (SURVEY §5 bug
list) the oracle follows the *same documented choices* as the TPU renderer,
controlled by the shared RenderConfig flags:
  * legacy_diffuse: diffuse term lit by normalize(lightPosition) (ref quirk).
  * closest hit is exact (no uniform-grid first-hit-voxel early-exit quirk).
  * entering-side total internal reflection kills the refracted child instead
    of emitting a zero-direction ray.
"""
from __future__ import annotations

import numpy as np

BIG = 1e30


def _normalize(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _reflect(i, n):
    return i - 2.0 * np.dot(n, i) * n


def _refract(i, n, eta):
    k = 1.0 - eta * eta * (1.0 - np.dot(n, i) ** 2)
    if k < 0:
        return np.zeros(3), False
    return eta * i - (eta * np.dot(n, i) + np.sqrt(k)) * n, True


class OracleRenderer:
    """Recursive per-pixel Whitted tracer over the SoA scene arrays."""

    def __init__(self, scene, cfg):
        # pull scene pytree leaves to float64 numpy
        g = lambda x: np.asarray(x, np.float64)
        self.tv = g(scene.tri_vertices)
        self.tc = g(scene.tri_colors)
        self.tm = {k: g(getattr(scene.tri_materials, k)) for k in ("ka", "kd", "ks", "kr", "kt", "eta")}
        self.sc = g(scene.sph_center)
        self.sr = g(scene.sph_radius)
        self.scol = g(scene.sph_color)
        self.sm = {k: g(getattr(scene.sph_materials, k)) for k in ("ka", "kd", "ks", "kr", "kt", "eta")}
        self.pc = g(scene.pln_corners)
        self.pcol = g(scene.pln_color)
        self.pm = {k: g(getattr(scene.pln_materials, k)) for k in ("ka", "kd", "ks", "kr", "kt", "eta")}
        self.cc = g(scene.cyl_center)
        self.cu = g(scene.cyl_up)
        self.cr = g(scene.cyl_radius)
        self.ccol = g(scene.cyl_color)
        self.cm = {k: g(getattr(scene.cyl_materials, k)) for k in ("ka", "kd", "ks", "kr", "kt", "eta")}
        self.lp = g(scene.lights.position)
        self.li = g(scene.lights.intensity)
        self.ambient = g(scene.ambient)
        self.background = g(scene.background)
        self.cfg = cfg

    # ------------------------------------------------------------------
    # intersections (vectorized over primitives, one ray at a time)
    # ------------------------------------------------------------------
    def _tri_hits(self, ro, rd, eps):
        if len(self.tv) == 0:
            return None
        a, b, c = self.tv[:, 0], self.tv[:, 1], self.tv[:, 2]
        e1, e2 = a - b, a - c
        n = np.cross(e1, e2)
        det = n @ rd
        s = a - ro
        ok = np.abs(det) >= self.cfg.det_epsilon
        det_s = np.where(ok, det, 1.0)
        t = np.einsum("ij,ij->i", s, n) / det_s
        beta = np.einsum("ij,ij->i", np.cross(s, e2), np.broadcast_to(rd, s.shape)) / det_s
        gamma = np.einsum("ij,ij->i", np.cross(e1, s), np.broadcast_to(rd, s.shape)) / det_s
        ok &= (beta > 0) & (gamma > 0) & (beta + gamma < 1) & (t > eps)
        return np.where(ok, t, BIG), beta, gamma

    def first_intersection(self, ro, rd):
        """Exact closest hit over all families. Returns hit dict or None."""
        eps = self.cfg.smallest_dist
        best = (BIG, None, -1)  # t, family, idx
        tri = self._tri_hits(ro, rd, eps)
        if tri is not None:
            t, beta, gamma = tri
            i = int(np.argmin(t))
            if t[i] < best[0]:
                best = (t[i], "tri", i)
        if len(self.sc):
            cv = ro - self.sc
            b2 = 2.0 * cv @ rd
            c2 = np.einsum("ij,ij->i", cv, cv) - self.sr ** 2
            disc = b2 * b2 - 4 * c2
            ok = disc >= 0
            sq = np.sqrt(np.where(ok, disc, 0))
            for roots in ((-b2 + sq) / 2, (-b2 - sq) / 2):
                tt = np.where(ok & (roots > eps), roots, BIG)
                i = int(np.argmin(tt))
                if tt[i] < best[0]:
                    best = (tt[i], "sph", i)
        if len(self.pc):
            for (i1, i2, i3) in ((0, 1, 2), (0, 2, 3)):
                a, b, c = self.pc[:, i1], self.pc[:, i2], self.pc[:, i3]
                e1, e2 = a - b, a - c
                n = np.cross(e1, e2)
                det = n @ rd
                ok = np.abs(det) >= self.cfg.det_epsilon
                det_s = np.where(ok, det, 1.0)
                s = a - ro
                t = np.einsum("ij,ij->i", s, n) / det_s
                beta = np.einsum("ij,ij->i", np.cross(s, e2), np.broadcast_to(rd, s.shape)) / det_s
                gamma = np.einsum("ij,ij->i", np.cross(e1, s), np.broadcast_to(rd, s.shape)) / det_s
                ok &= (beta > 0) & (gamma > 0) & (beta + gamma < 1) & (t > eps)
                t = np.where(ok, t, BIG)
                i = int(np.argmin(t))
                if t[i] < best[0]:
                    best = (t[i], "pln", i)
        if len(self.cc):
            dpar = (rd @ self.cu.T)[:, None] * self.cu
            t1v = rd - dpar
            oc = ro - self.cc
            t2v = oc - np.einsum("ij,ij->i", oc, self.cu)[:, None] * self.cu
            A = np.einsum("ij,ij->i", t1v, t1v)
            B = 2 * np.einsum("ij,ij->i", t1v, t2v)
            C = np.einsum("ij,ij->i", t2v, t2v) - self.cr ** 2
            disc = B * B - 4 * A * C
            ok = (disc >= 0) & (np.abs(A) > 0)
            As = np.where(np.abs(A) > 0, A, 1.0)
            sq = np.sqrt(np.where(ok, disc, 0))
            r1, r2 = (-B + sq) / (2 * As), (-B - sq) / (2 * As)
            lo, hi = np.minimum(r1, r2), np.maximum(r1, r2)
            t = np.where(lo > 0, lo, hi)
            t = np.where(ok & (t > eps), t, BIG)
            i = int(np.argmin(t))
            if t[i] < best[0]:
                best = (t[i], "cyl", i)
        if best[1] is None:
            return None
        t, fam, i = best
        pos = ro + t * rd
        if fam == "tri":
            a, b, c = self.tv[i]
            normal = np.cross(a - b, a - c)
            # barycentric color (BarycentricMaterial::shade, Serial/material.cpp:10-22)
            e1, e2 = a - b, a - c
            det = np.dot(np.cross(e1, e2), rd)
            s = a - ro
            beta = np.dot(np.cross(s, e2), rd) / det
            gamma = np.dot(np.cross(e1, s), rd) / det
            alpha = 1.0 - beta - gamma
            color = alpha * self.tc[i, 0] + beta * self.tc[i, 1] + gamma * self.tc[i, 2]
            mats = {k: self.tm[k][i] for k in self.tm}
        elif fam == "sph":
            normal = pos - self.sc[i]
            color = self.scol[i]
            mats = {k: self.sm[k][i] for k in self.sm}
        elif fam == "pln":
            p1, p2, p3 = self.pc[i, 0], self.pc[i, 1], self.pc[i, 2]
            normal = np.cross(p3 - p1, p2 - p1)
            color = self.pcol[i]
            mats = {k: self.pm[k][i] for k in self.pm}
        else:
            pc = pos - self.cc[i]
            up = self.cu[i]
            normal = pc - (np.dot(pc, up) / np.dot(up, up)) * up
            color = self.ccol[i]
            mats = {k: self.cm[k][i] for k in self.cm}
        return dict(t=t, pos=pos, normal=normal, color=color, **mats)

    def occluded(self, ro, rd):
        return self.first_intersection(ro, rd) is not None

    # ------------------------------------------------------------------
    # shading (World::shade_ray transliteration)
    # ------------------------------------------------------------------
    def _phong_pow(self, d):
        e = self.cfg.phong_exp
        if e % 2 == 0:
            return abs(d) ** e
        return max(d, 0.0) ** e

    def get_light_shade(self, position, normal, lpos, lint, color, kd, ks, view):
        """Serial/world.cpp:126-137."""
        n = _normalize(normal)
        r = _normalize(_reflect(-_normalize(lpos - position), n))
        if self.cfg.legacy_diffuse:
            diffuse = max(np.dot(n, _normalize(lpos)), 0.0)
        else:
            diffuse = max(np.dot(n, _normalize(lpos - position)), 0.0)
        spec = self._phong_pow(np.dot(_normalize(view), r))
        return kd * diffuse * lint * color + ks * spec * lint

    def shade_ray(self, ro, rd, level=0):
        cfg = self.cfg
        if level > cfg.max_depth:
            return self.background.copy()
        rd = _normalize(rd)
        hit = self.first_intersection(ro, rd)
        if hit is None:
            return self.background.copy()
        pos = hit["pos"]
        # shadow test (Serial/world.cpp:42-51)
        is_shadow = False
        if cfg.shadows:
            for l in range(len(self.lp)):
                to_light = self.lp[l] - pos
                s_ro = pos + cfg.shadow_origin_bias * to_light
                if self.occluded(s_ro, _normalize(to_light)):
                    is_shadow = True
        amb = self.ambient * hit["color"] * hit["ka"]
        light_color = np.zeros(3)
        for l in range(len(self.lp)):
            light_color += self.get_light_shade(pos, hit["normal"], self.lp[l], self.li[l],
                                                hit["color"], hit["kd"], hit["ks"], rd)
        light_color = light_color + amb
        final = light_color.copy()
        if is_shadow:
            b = cfg.shadow_blend
            final = final * b + amb * (1 - b)

        n = _normalize(hit["normal"])
        i = rd
        eta = hit["eta"]
        t = hit["t"]
        if hit["kr"] > 0 and hit["kt"] > 0:
            # dielectric (Serial/world.cpp:77-100)
            r = _reflect(i, n)
            k = np.ones(3)
            if np.dot(rd, n) < 0:
                tdir, ok = _refract(i, n, eta)
                c = -np.dot(i, n)
                if not ok:
                    # entering-side TIR: renderer kills refracted child —
                    # reflect-only with fresnel (shared documented divergence)
                    tdir = None
            else:
                k = np.exp(-np.array(cfg.beer_sigma) * t)
                tdir, ok = _refract(i, -n, 1.0 / eta)
                if ok:
                    c = np.dot(tdir, n)
                else:
                    ray_o = pos + cfg.ray_offset * r
                    return k * self.shade_ray(ray_o, r, level + 1)
            r0 = ((eta - 1) ** 2) / ((eta + 1) ** 2)
            fr = r0 + (1 - r0) * (1 - c) ** 5
            out = k * fr * self.shade_ray(pos + cfg.ray_offset * r, r, level + 1)
            if tdir is not None:
                out = out + k * (1 - fr) * self.shade_ray(pos + cfg.ray_offset * tdir, tdir, level + 1)
            return out
        elif hit["kr"] > 0:
            r = _reflect(i, n)
            final = final + hit["kr"] * self.shade_ray(pos + cfg.ray_offset * r, r, level + 1)
        return final

    # ------------------------------------------------------------------
    def render(self, camera):
        """Full-frame render to a top-down (H, W, 3) image clamped to [0,1].

        Camera math mirrors Serial/camera.cpp:33-44; pixel (i,j) has j as the
        row-from-bottom, flipped to top-down at the end (like
        realtrace_tpu.render.camera.image_from_buffer).
        """
        w, h = camera.width, camera.height
        pos = np.asarray(camera.position, np.float64)
        target = np.asarray(camera.target, np.float64)
        up = _normalize(np.asarray(camera.up, np.float64))
        wv = _normalize(pos - target)
        u = _normalize(np.cross(up, wv))
        v = _normalize(np.cross(wv, u))
        aspect = w / h
        focal = 1.0 / (2.0 * np.tan(np.deg2rad(float(camera.fovy)) / 2.0))
        img = np.zeros((h, w, 3))
        for j in range(h):
            yw = (j - h / 2.0 + 0.5) / h
            for i in range(w):
                xw = aspect * (i - w / 2.0 + 0.5) / w
                d = _normalize(-wv * focal + u * xw + v * yw)
                img[j, i] = self.shade_ray(pos, d)
        return np.clip(img[::-1], 0.0, 1.0)
