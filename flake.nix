# Dev shell parity with the reference's flake.nix (/root/reference/flake.nix):
# a reproducible environment with the toolchain the framework needs. The JAX
# TPU runtime itself comes from pip (jax[tpu]) on TPU hosts.
{
  description = "TPU-native genome downsampler dev shell";

  inputs.nixpkgs.url = "github:NixOS/nixpkgs/nixos-24.05";

  outputs = { self, nixpkgs }:
    let
      forAllSystems = f: nixpkgs.lib.genAttrs [ "x86_64-linux" "aarch64-linux" ]
        (system: f nixpkgs.legacyPackages.${system});
    in {
      devShells = forAllSystems (pkgs: {
        default = pkgs.mkShell {
          packages = with pkgs; [
            gcc
            zlib
            (python312.withPackages (ps: with ps; [ numpy scipy pytest ]))
            ruff
          ];
          shellHook = ''
            echo "genome-downsampler-tpu dev shell; pip install jax (or jax[tpu]) into a venv"
          '';
        };
      });
    };
}
